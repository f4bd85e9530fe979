"""Import/export of reference PyTorch checkpoints.

The reference saves checkpoints as ``{epoch}_gen_net.pt`` /
``{epoch}_eva_net.pt`` whose state dicts use legacy FFHNet key names
(``'ffhgenerator_state_dict'`` etc., ``dexgangrasp.py:662-712``).  This
module maps those onto our functional pytrees (and back), so users of the
reference can bring their trained weights.

Torch is used only for (de)serialization on the host — no torch compute.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _t2n(t) -> np.ndarray:
    # IMPORTANT: copy, don't view.  ``tensor.numpy()`` aliases the live
    # torch storage; CPU jax zero-copies aligned numpy arrays into jit
    # inputs, so a later in-place torch mutation (optimizer step, train-mode
    # BN forward) would race against asynchronously executing jax programs
    # still reading that memory.
    return np.array(t.detach().cpu().numpy(), dtype=np.float32, copy=True)


def _linear_from_sd(sd: dict, prefix: str) -> dict:
    return {"w": _t2n(sd[prefix + ".weight"]).T.copy(),
            "b": _t2n(sd[prefix + ".bias"])}


def _bn_from_sd(sd: dict, prefix: str) -> Tuple[dict, dict]:
    params = {"scale": _t2n(sd[prefix + ".weight"]),
              "bias": _t2n(sd[prefix + ".bias"])}
    state = {"mean": _t2n(sd[prefix + ".running_mean"]),
             "var": _t2n(sd[prefix + ".running_var"])}
    return params, state


def _resblock_from_sd(sd: dict, prefix: str, has_fc3: bool
                      ) -> Tuple[dict, dict]:
    p = {"fc1": _linear_from_sd(sd, prefix + ".fc1"),
         "fc2": _linear_from_sd(sd, prefix + ".fc2")}
    bn1_p, bn1_s = _bn_from_sd(sd, prefix + ".bn1")
    bn2_p, bn2_s = _bn_from_sd(sd, prefix + ".bn2")
    p["bn1"], p["bn2"] = bn1_p, bn2_p
    if has_fc3:
        p["fc3"] = _linear_from_sd(sd, prefix + ".fc3")
    return p, {"bn1": bn1_s, "bn2": bn2_s}


def generator_from_torch_sd(sd: dict, prefix: str = "generator."
                            ) -> Tuple[dict, dict]:
    """Torch DexGANGrasp state dict → (params, state) for DexGenerator.

    Key layout per reference networks.py:58-77 (gen_bn1, gen_rb1, gen_rb2,
    gen_joint_conf, gen_rot, gen_transl)."""
    bn0_p, bn0_s = _bn_from_sd(sd, prefix + "gen_bn1")
    rb1_p, rb1_s = _resblock_from_sd(sd, prefix + "gen_rb1", True)
    rb2_p, rb2_s = _resblock_from_sd(sd, prefix + "gen_rb2", True)
    params = {
        "bn0": bn0_p, "rb1": rb1_p, "rb2": rb2_p,
        "joint_conf": _linear_from_sd(sd, prefix + "gen_joint_conf"),
        "rot": _linear_from_sd(sd, prefix + "gen_rot"),
        "transl": _linear_from_sd(sd, prefix + "gen_transl"),
    }
    state = {"bn0": bn0_s, "rb1": rb1_s, "rb2": rb2_s}
    return params, state


def discriminator_from_torch_sd(sd: dict, prefix: str = "discriminator."
                                ) -> Tuple[dict, dict]:
    """Layout per reference networks.py:105-122."""
    bn0_p, bn0_s = _bn_from_sd(sd, prefix + "disc_bn1")
    rb1_p, rb1_s = _resblock_from_sd(sd, prefix + "disc_rb1", True)
    rb2_p, rb2_s = _resblock_from_sd(sd, prefix + "disc_rb2", True)
    params = {"bn0": bn0_p, "rb1": rb1_p, "rb2": rb2_p,
              "out": _linear_from_sd(sd, prefix + "out_success")}
    state = {"bn0": bn0_s, "rb1": rb1_s, "rb2": rb2_s}
    return params, state


def evaluator_from_torch_sd(sd: dict, prefix: str = "") -> Tuple[dict, dict]:
    """Layout per reference networks.py:278-295 (bn1, rb1-3, out_success).
    Variable depth: consumes rb1..rbN for any N present in the state dict
    (the reference's ablation variants)."""
    bn1_p, bn1_s = _bn_from_sd(sd, prefix + "bn1")
    params = {"bn1": bn1_p,
              "out": _linear_from_sd(sd, prefix + "out_success")}
    state = {"bn1": bn1_s}
    i = 1
    while f"{prefix}rb{i}.fc1.weight" in sd:
        params[f"rb{i}"], state[f"rb{i}"] = _resblock_from_sd(
            sd, f"{prefix}rb{i}", True)
        i += 1
    assert i > 1, "no rb1 in evaluator state dict"
    return params, state


def load_reference_gen_checkpoint(path: str):
    """Load a reference ``*_gen_net.pt`` → (gen_params, gen_state,
    disc_params, disc_state, epoch).  Uses the legacy
    'ffhgenerator_state_dict' key (dexgangrasp.py:607)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["ffhgenerator_state_dict"]
    gp, gs = generator_from_torch_sd(sd)
    dp, ds = discriminator_from_torch_sd(sd)
    return gp, gs, dp, ds, ckpt.get("epoch")


def load_reference_eva_checkpoint(path: str):
    """Load a reference ``*_eva_net.pt`` → (params, state, epoch)
    ('ffhevaluator_state_dict', dexgangrasp.py:677)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    p, s = evaluator_from_torch_sd(ckpt["ffhevaluator_state_dict"])
    return p, s, ckpt.get("epoch")


# ------------------------------------------------------------------ export


def _linear_to_sd(out: dict, prefix: str, p: dict) -> None:
    import torch

    out[prefix + ".weight"] = torch.from_numpy(np.asarray(p["w"]).T.copy())
    out[prefix + ".bias"] = torch.from_numpy(np.asarray(p["b"]).copy())


def _bn_to_sd(out: dict, prefix: str, p: dict, s: dict) -> None:
    import torch

    out[prefix + ".weight"] = torch.from_numpy(np.asarray(p["scale"]).copy())
    out[prefix + ".bias"] = torch.from_numpy(np.asarray(p["bias"]).copy())
    out[prefix + ".running_mean"] = torch.from_numpy(np.asarray(s["mean"]).copy())
    out[prefix + ".running_var"] = torch.from_numpy(np.asarray(s["var"]).copy())
    out[prefix + ".num_batches_tracked"] = torch.tensor(0, dtype=torch.long)


def _resblock_to_sd(out: dict, prefix: str, p: dict, s: dict) -> None:
    _linear_to_sd(out, prefix + ".fc1", p["fc1"])
    _linear_to_sd(out, prefix + ".fc2", p["fc2"])
    _bn_to_sd(out, prefix + ".bn1", p["bn1"], s["bn1"])
    _bn_to_sd(out, prefix + ".bn2", p["bn2"], s["bn2"])
    if "fc3" in p:
        _linear_to_sd(out, prefix + ".fc3", p["fc3"])


def dexgan_to_torch_sd(gen_params, gen_state, disc_params, disc_state
                       ) -> Dict:
    """Our pytrees → reference-layout torch state dict (round-trippable into
    the reference's DexGANGrasp.load_state_dict)."""
    out: Dict = {}
    _bn_to_sd(out, "generator.gen_bn1", gen_params["bn0"], gen_state["bn0"])
    _resblock_to_sd(out, "generator.gen_rb1", gen_params["rb1"], gen_state["rb1"])
    _resblock_to_sd(out, "generator.gen_rb2", gen_params["rb2"], gen_state["rb2"])
    _linear_to_sd(out, "generator.gen_joint_conf", gen_params["joint_conf"])
    _linear_to_sd(out, "generator.gen_rot", gen_params["rot"])
    _linear_to_sd(out, "generator.gen_transl", gen_params["transl"])
    _bn_to_sd(out, "discriminator.disc_bn1", disc_params["bn0"], disc_state["bn0"])
    _resblock_to_sd(out, "discriminator.disc_rb1", disc_params["rb1"], disc_state["rb1"])
    _resblock_to_sd(out, "discriminator.disc_rb2", disc_params["rb2"], disc_state["rb2"])
    _linear_to_sd(out, "discriminator.out_success", disc_params["out"])
    return out


def evaluator_to_torch_sd(params, state) -> Dict:
    out: Dict = {}
    _bn_to_sd(out, "bn1", params["bn1"], state["bn1"])
    for name in sorted((k for k in params if k.startswith("rb")),
                       key=lambda k: int(k[2:])):
        _resblock_to_sd(out, name, params[name], state[name])
    _linear_to_sd(out, "out_success", params["out"])
    return out


def save_reference_gen_checkpoint(path: str, gen_params, gen_state,
                                  disc_params, disc_state,
                                  epoch: int = 0) -> str:
    """Write a ``*_gen_net.pt`` the reference's DexGanGrasp.load_dexgenerator
    can consume (legacy 'ffhgenerator_state_dict' key, dexgangrasp.py:607).

    Optimizer/scheduler state dicts are omitted — the reference only needs
    them for continue_train; eval-mode loading reads the net dict alone."""
    import torch

    sd = dexgan_to_torch_sd(gen_params, gen_state, disc_params, disc_state)
    torch.save({"epoch": epoch, "ffhgenerator_state_dict": sd}, path)
    return path


def save_reference_eva_checkpoint(path: str, params, state,
                                  epoch: int = 0) -> str:
    """Write a ``*_eva_net.pt`` in the reference layout
    ('ffhevaluator_state_dict', dexgangrasp.py:677)."""
    import torch

    sd = evaluator_to_torch_sd(params, state)
    torch.save({"epoch": epoch, "ffhevaluator_state_dict": sd}, path)
    return path
