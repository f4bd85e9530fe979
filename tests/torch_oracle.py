"""PyTorch oracle networks for parity testing.

These mirror the reference architecture (DexGanGrasp/models/networks.py:26-337)
so our JAX networks can be checked forward-for-forward after weight transfer.
Used only by tests.
"""
import torch
from torch import nn


class ResBlock(nn.Module):
    def __init__(self, fin, fout, n_neurons=256):
        super().__init__()
        self.fin, self.fout = fin, fout
        self.fc1 = nn.Linear(fin, n_neurons)
        self.bn1 = nn.BatchNorm1d(n_neurons)
        self.fc2 = nn.Linear(n_neurons, fout)
        self.bn2 = nn.BatchNorm1d(fout)
        if fin != fout:
            self.fc3 = nn.Linear(fin, fout)
        self.ll = nn.LeakyReLU(negative_slope=0.2)

    def forward(self, x, final_nl=True):
        xin = x if self.fin == self.fout else self.ll(self.fc3(x))
        h = self.ll(self.bn1(self.fc1(x)))
        h = self.bn2(self.fc2(h))
        out = xin + h
        return self.ll(out) if final_nl else out


class TorchGenerator(nn.Module):
    def __init__(self, latent_dim=5, n_joints=12, n_neurons=512, in_bps=4096):
        super().__init__()
        self.gen_bn1 = nn.BatchNorm1d(in_bps)
        self.gen_rb1 = ResBlock(latent_dim + in_bps, n_neurons)
        self.gen_rb2 = ResBlock(n_neurons + latent_dim + in_bps, n_neurons)
        self.gen_joint_conf = nn.Linear(n_neurons, n_joints)
        self.gen_rot = nn.Linear(n_neurons, 6)
        self.gen_transl = nn.Linear(n_neurons, 3)

    def forward(self, z, bps):
        o = self.gen_bn1(bps.contiguous())
        x0 = torch.cat([z, o], dim=1)
        x = self.gen_rb1(x0, True)
        x = self.gen_rb2(torch.cat([x0, x], dim=1), True)
        return (self.gen_rot(x), self.gen_transl(x), self.gen_joint_conf(x))


class TorchDiscriminator(nn.Module):
    def __init__(self, n_joints=12, n_neurons=512, in_bps=4096):
        super().__init__()
        in_pose = 9 + 3 + n_joints
        self.disc_bn1 = nn.BatchNorm1d(in_bps + in_pose)
        self.disc_rb1 = ResBlock(in_bps + in_pose, n_neurons)
        self.disc_rb2 = ResBlock(n_neurons + in_bps + in_pose, n_neurons)
        self.out_success = nn.Linear(n_neurons, 1)

    def forward(self, bps, rot_flat, transl, joints):
        x = torch.cat([bps, rot_flat, transl, joints], dim=1)
        x0 = self.disc_bn1(x)
        x = self.disc_rb1(x0, True)
        x = self.disc_rb2(torch.cat([x0, x], dim=1), True)
        return torch.sigmoid(self.out_success(x))


class TorchEvaluator(nn.Module):
    def __init__(self, n_neurons=512, in_bps=4096):
        super().__init__()
        in_pose = 9 + 3
        self.bn1 = nn.BatchNorm1d(in_bps + in_pose)
        self.rb1 = ResBlock(in_bps + in_pose, n_neurons)
        self.rb2 = ResBlock(in_bps + in_pose + n_neurons, n_neurons)
        self.rb3 = ResBlock(in_bps + in_pose + n_neurons, n_neurons)
        self.out_success = nn.Linear(n_neurons, 1)
        self.dout = nn.Dropout(0.3)

    def forward(self, bps, rot_flat, transl):
        x = torch.cat([bps, rot_flat, transl], dim=1)
        x0 = self.bn1(x)
        x = self.rb1(x0)
        x = self.dout(x)
        x = self.rb2(torch.cat([x, x0], dim=1))
        x = self.dout(x)
        x = self.rb3(torch.cat([x, x0], dim=1))
        x = self.dout(x)
        return torch.sigmoid(self.out_success(x))
