"""GAN + evaluator training steps — jitted, data-parallel-ready.

Replicates the reference's update semantics (``dexgangrasp.py:739-823``)
as pure functions:

one ``update_dexgangrasp`` step =
  1. generator forward (train-mode BN) on z ~ N(0, I),
  2. D(real) then D(fake.detach) — two train-mode forwards, BN running
     stats updated sequentially in that order,
  3. discriminator Adam step on BCE (or Wasserstein + gradient penalty),
  4. every ``gen_train_freq`` steps: D(fake) with grads into G, generator
     Adam step on adversarial + 100·transl + 1·rot + 10·joint recon loss
     (coefficients ``dexgangrasp.py:92-94``).

The WGAN-GP path keeps the reference's per-field penalty structure
(``dexgangrasp.py:174-197``) including its quirky ``alpha ~ randn``
interpolation weights (``:152-154``; documented compat flag
``gp_alpha_normal`` — set False for the standard uniform interpolant).

Optimizers are torch-Adam equivalents (L2 weight decay added to the
gradient before the moment updates, betas (β1, 0.999)); learning rates are
injected hyperparams so the host-side plateau scheduler can anneal them.

Every step function takes/returns an explicit ``TrainState`` pytree and is
safe under jit/pjit; data parallelism shards the batch axis (see
parallel/).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from dexgangrasp_tpu.core.rotations import rot_matrix_from_ortho6d
from dexgangrasp_tpu.models.networks import (
    DexDiscriminator,
    DexEvaluator,
    DexGenerator,
)
from dexgangrasp_tpu.train.losses import (
    accuracy_evaluator,
    bce,
    bce_logits,
    class_labels_from_logits,
    transl_rot_6d_l2_loss,
)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Hyperparameters (defaults = reference config_dexgangrasp.yaml)."""

    latent_dim: int = 5
    n_joints: int = 12
    lr: float = 1e-4          # evaluator + whole-GAN optimizer
    lr_gen: float = 1e-4
    lr_dis: float = 1e-4
    beta1: float = 0.9
    weight_decay: float = 5e-4
    bce_weight: float = 1.0
    transl_coef: float = 100.0
    rot_coef: float = 1.0
    conf_coef: float = 10.0
    kl_coef: float = 0.005
    is_wgan: bool = False
    gp_gain: float = 10.0
    gp_alpha_normal: bool = True  # reference quirk dexgangrasp.py:152
    # the reference's Wasserstein losses consume SIGMOID-squashed
    # discriminator outputs (networks.py:157 applies sigmoid
    # unconditionally; dexgangrasp.py:199-211 takes means of those) —
    # unusual for a WGAN critic but reference-faithful.  Set True for the
    # textbook raw-critic formulation.
    wgan_raw_critic: bool = False
    gen_train_freq: int = 1
    init_type: str = "xavier"
    init_gain: float = 0.02
    # reconstruction loss selection (reference define_losses,
    # dexgangrasp.py:13-25): 'transl_rot_6d_l2' (default) or
    # 'control_point_l1'; 'control_point_chamfer' additionally covers the
    # chamfer-loss training config with the Pallas/XLA chamfer reduction.
    recon_loss: str = "transl_rot_6d_l2"
    n_control_points: int = 64
    # evaluator architecture (reference ablation grid utils/experiments.py:
    # 3-56: 2/3/4 ResBlocks × 256/512/1024 neurons; shipped = 3 × 512)
    eva_n_neurons: int = 512
    eva_n_resblocks: int = 3
    # mode-seeking diversity regularizer (MSGAN, arXiv:1903.05628) — a
    # beyond-reference knob attacking the cGAN family's mode collapse (the
    # reference's 100·transl recon loss pulls G(z) toward the conditional
    # mean regardless of z; docs/RESULTS.md coverage 0.007).  Adds
    # ms_coef · mean(1 / (‖G(z1)−G(z2)‖₁/‖z1−z2‖₁ + ε)) to the generator
    # loss.  0.0 (default) = reference-faithful objective, extra forward
    # skipped entirely.
    ms_coef: float = 0.0
    # 'bfloat16' = mixed precision: f32 master params + Adam state, bf16
    # network fwd/bwd (the cast lives inside the loss fns so grads flow to
    # f32 leaves); BN running stats stay f32 (the EMA update promotes).
    # Losses/reductions are f32.  Default 'float32' keeps torch parity.
    # Partial-precision probes for the bf16-GAN quality gap (VERDICT r2
    # next-9; round-2 isolated the sensitivity to the gradient path, not
    # BN stats): 'bfloat16_gen' runs only the generator in bf16 (D f32),
    # 'bfloat16_disc' only the discriminator.
    compute_dtype: str = "float32"


def make_optimizer(lr: float, beta1: float, weight_decay: float
                   ) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, (beta1, 0.999), weight_decay) equivalent."""
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=beta1, b2=0.999, eps=1e-8),
            optax.scale(-learning_rate),
        ))(learning_rate=lr)


def set_lr(opt_state, lr: float):
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)
    return opt_state


def get_lr(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GanTrainState:
    gen_params: Any
    gen_state: Any
    disc_params: Any
    disc_state: Any
    gen_opt: Any
    disc_opt: Any
    step: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EvaluatorTrainState:
    params: Any
    state: Any
    opt: Any
    step: jax.Array


class GanTrainer:
    """Builds nets + optimizers and exposes jitted train/eval steps.

    The functional analogue of the reference's ``DexGanGrasp`` god object
    (``dexgangrasp.py:65-137``), restricted to training; inference lives in
    engine/.
    """

    def __init__(self, cfg: TrainConfig = TrainConfig()):
        self.cfg = cfg
        self.gen = DexGenerator(latent_dim=cfg.latent_dim, n_joints=cfg.n_joints)
        self.disc = DexDiscriminator(
            n_joints=cfg.n_joints,
            sigmoid=not (cfg.is_wgan and cfg.wgan_raw_critic))
        self.eva = DexEvaluator(n_neurons=cfg.eva_n_neurons,
                                n_resblocks=cfg.eva_n_resblocks)
        self.gen_tx = make_optimizer(cfg.lr_gen, cfg.beta1, cfg.weight_decay)
        self.disc_tx = make_optimizer(cfg.lr_dis, cfg.beta1, cfg.weight_decay)
        self.eva_tx = make_optimizer(cfg.lr, cfg.beta1, cfg.weight_decay)
        if cfg.recon_loss not in ("transl_rot_6d_l2", "control_point_l1",
                                  "control_point_chamfer"):
            raise ValueError(
                "Requested loss not available, choose [transl_rot_6d_l2, "
                "control_point_l1, control_point_chamfer]")
        if cfg.recon_loss != "transl_rot_6d_l2":
            from dexgangrasp_tpu.tools.control_points import (
                create_palm_control_points,
            )

            self._control_points = jnp.asarray(
                create_palm_control_points(cfg.n_control_points))
        else:
            self._control_points = None

    def _recon_losses(self, rot_6d, transl, real_rot_flat, real_transl):
        """Selected reconstruction loss → (transl_term, rot_term).

        For the control-point variants the pose error is a single joint
        term on FK'd palm points; it is reported under 'transl_loss' with
        the rot term zeroed (the reference's control_point path likewise
        collapses pose error into one number, losses.py:19-51)."""
        cfg = self.cfg
        if cfg.recon_loss == "transl_rot_6d_l2":
            return transl_rot_6d_l2_loss(rot_6d, transl, real_rot_flat,
                                         real_transl)
        n = transl.shape[0]
        cp = self._control_points
        pred_R = rot_matrix_from_ortho6d(rot_6d)
        real_R = real_rot_flat.reshape(n, 3, 3)
        pred_pts = jnp.einsum("bij,pj->bpi", pred_R, cp) + transl[:, None, :]
        real_pts = jnp.einsum("bij,pj->bpi", real_R, cp) \
            + real_transl[:, None, :]
        if cfg.recon_loss == "control_point_l1":
            err = jnp.mean(jnp.sum(jnp.abs(pred_pts - real_pts), -1))
            return err, jnp.zeros_like(err)
        # chamfer between the FK'd point sets, batched
        from dexgangrasp_tpu.ops.chamfer import chamfer_distance_xla

        per_pair = jax.vmap(lambda a, b: chamfer_distance_xla(
            a, b, block=cp.shape[0]))(pred_pts, real_pts)
        err = jnp.mean(per_pair)
        return err, jnp.zeros_like(err)

    # ------------------------------------------------------------ builders

    def init_gan_state(self, key: jax.Array) -> GanTrainState:
        kg, kd = jax.random.split(key)
        gp, gs = self.gen.init(kg, self.cfg.init_type, self.cfg.init_gain)
        dp, ds = self.disc.init(kd, self.cfg.init_type, self.cfg.init_gain)
        return GanTrainState(
            gen_params=gp, gen_state=gs, disc_params=dp, disc_state=ds,
            gen_opt=self.gen_tx.init(gp), disc_opt=self.disc_tx.init(dp),
            step=jnp.zeros((), jnp.int32))

    def init_evaluator_state(self, key: jax.Array) -> EvaluatorTrainState:
        p, s = self.eva.init(key, self.cfg.init_type, self.cfg.init_gain)
        return EvaluatorTrainState(params=p, state=s, opt=self.eva_tx.init(p),
                                   step=jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------- helpers

    def _disc_losses(self, real_score, fake_score, gp):
        cfg = self.cfg
        if cfg.is_wgan:
            loss_real = jnp.mean(real_score)
            loss_fake = jnp.mean(fake_score)
            total = -loss_real + loss_fake + cfg.gp_gain * gp
        else:
            # scores are logits here; fused BCE is the stable equivalent of
            # the reference's sigmoid+BCELoss
            loss_real = cfg.bce_weight * bce_logits(real_score,
                                                    jnp.ones_like(real_score))
            loss_fake = cfg.bce_weight * bce_logits(fake_score,
                                                    jnp.zeros_like(fake_score))
            total = (loss_real + loss_fake) / 2.0
        return total, {"total_loss_disc": total, "bce_loss_real": loss_real,
                       "bce_loss_fake": loss_fake}

    def _gradient_penalty(self, disc_params, disc_state, key, bps,
                          real_rot_flat, real_transl, real_joints,
                          fake_rot_flat, fake_transl, fake_joints):
        """Per-field WGAN-GP (dexgangrasp.py:149-197): interpolate each pose
        field independently, run D once, penalize each field's gradient
        norm, average the three penalties."""
        cfg = self.cfg
        n = bps.shape[0]
        ks = jax.random.split(key, 3)

        def alpha(k, shape):
            if cfg.gp_alpha_normal:
                return jax.random.normal(k, shape)
            return jax.random.uniform(k, shape)

        a_rot = alpha(ks[0], (n, 1))
        a_tra = alpha(ks[1], (n, 1))
        a_jnt = alpha(ks[2], (n, 1))
        i_rot = a_rot * real_rot_flat + (1 - a_rot) * fake_rot_flat
        i_tra = a_tra * real_transl + (1 - a_tra) * fake_transl
        i_jnt = a_jnt * real_joints + (1 - a_jnt) * fake_joints

        def score_sum(rot, tra, jnt):
            s, _ = self.disc.apply(disc_params, disc_state, bps, rot, tra,
                                   jnt, train=True)
            return jnp.sum(s)

        g_rot, g_tra, g_jnt = jax.grad(score_sum, argnums=(0, 1, 2))(
            i_rot, i_tra, i_jnt)

        def penalty(g):
            norms = jnp.linalg.norm(g.reshape(n, -1), axis=1)
            return jnp.mean((norms - 1.0) ** 2)

        return (penalty(g_rot) + penalty(g_tra) + penalty(g_jnt)) / 3.0

    # --------------------------------------------------------------- steps

    @functools.partial(jax.jit, static_argnames=("self", "is_train_gen"))
    def gan_step(self, ts: GanTrainState, batch: Dict[str, jax.Array],
                 key: jax.Array, is_train_gen: bool = True
                 ) -> Tuple[GanTrainState, Dict[str, jax.Array]]:
        """One update_dexgangrasp step (jitted).  batch: bps_object
        (B,4096), rot_matrix (B,3,3), transl (B,3), joint_conf (B,J)."""
        return self.gan_step_body(ts, batch, key, is_train_gen)

    def gan_step_body(self, ts: GanTrainState, batch: Dict[str, jax.Array],
                      key: jax.Array, is_train_gen: bool = True
                      ) -> Tuple[GanTrainState, Dict[str, jax.Array]]:
        """Un-jitted step body — composable inside larger programs (the
        device-resident multi-step trainer in train/fast.py scans it)."""
        cfg = self.cfg
        kz, kgp = jax.random.split(key)
        bps = batch["bps_object"].astype(jnp.float32)
        n = bps.shape[0]
        real_rot_flat = batch["rot_matrix"].astype(jnp.float32).reshape(n, 9)
        real_transl = batch["transl"].astype(jnp.float32)
        real_joints = batch["joint_conf"].astype(jnp.float32)
        # optional test seam: an explicit latent batch overrides the PRNG
        # draw so parity tests can feed torch and jax identical z
        if "z" in batch:
            z = batch["z"].astype(jnp.float32)
        else:
            z = jax.random.normal(kz, (n, cfg.latent_dim), jnp.float32)

        # mixed precision: network fwd/bwd in bf16 via casts inside the
        # loss fns (f32 masters; BN state EMA promotes back to f32);
        # rotations/losses/reductions stay f32.  _cg / _cd cast the
        # generator / discriminator paths independently so the partial-
        # precision modes can isolate which net's gradients carry the
        # bf16 quality gap.
        gen_bf16 = cfg.compute_dtype in ("bfloat16", "bfloat16_gen")
        disc_bf16 = cfg.compute_dtype in ("bfloat16", "bfloat16_disc")
        _half = lambda t: jax.tree.map(lambda a: a.astype(jnp.bfloat16), t)
        _cg = _half if gen_bf16 else (lambda t: t)
        _cd = _half if disc_bf16 else (lambda t: t)
        _f = ((lambda t: jax.tree.map(lambda a: a.astype(jnp.float32), t))
              if (gen_bf16 or disc_bf16) else (lambda t: t))

        # 1. generator forward (train-mode BN), detached for the D phase
        y_fake, gen_state_after = self.gen.apply(
            _cg(ts.gen_params), ts.gen_state, _cg(z), _cg(bps), train=True)
        y_fake = _f(y_fake)
        gen_state_after = _f(gen_state_after)
        fake_rot_flat = jax.lax.stop_gradient(
            rot_matrix_from_ortho6d(y_fake.rot_6d).reshape(n, 9))
        fake_transl = jax.lax.stop_gradient(y_fake.transl)
        fake_joints = jax.lax.stop_gradient(y_fake.joint_conf)

        # 2-3. discriminator update
        # BCE path consumes logits (stable fused BCE, same math);
        # the WGAN path consumes the discriminator's own output — which in
        # the reference is sigmoid-squashed (networks.py:157)
        ret_logits = not cfg.is_wgan

        def disc_loss_fn(disc_params):
            dp = _cd(disc_params)
            real_score, ds1 = self.disc.apply(
                dp, ts.disc_state, _cd(bps), _cd(real_rot_flat),
                _cd(real_transl), _cd(real_joints), train=True,
                return_logits=ret_logits)
            fake_score, ds2 = self.disc.apply(
                dp, ds1, _cd(bps), _cd(fake_rot_flat), _cd(fake_transl),
                _cd(fake_joints), train=True, return_logits=ret_logits)
            gp = (self._gradient_penalty(
                dp, ts.disc_state, kgp, bps,
                real_rot_flat, real_transl, real_joints,
                fake_rot_flat, fake_transl, fake_joints)
                if cfg.is_wgan else 0.0)
            total, logs = self._disc_losses(_f(real_score), _f(fake_score),
                                            gp)
            return total, (_f(ds2), logs)

        (disc_grads, (disc_state_after, disc_logs)) = jax.grad(
            disc_loss_fn, has_aux=True)(ts.disc_params)
        disc_updates, disc_opt = self.disc_tx.update(
            disc_grads, ts.disc_opt, ts.disc_params)
        disc_params = optax.apply_updates(ts.disc_params, disc_updates)

        # 4. generator update (every gen_train_freq steps — host decides)
        if is_train_gen:
            def gen_loss_fn(gen_params):
                yf, gs = self.gen.apply(_cg(gen_params), ts.gen_state,
                                        _cg(z), _cg(bps), train=True)
                yf, gs = _f(yf), _f(gs)
                rot_mat_flat = rot_matrix_from_ortho6d(yf.rot_6d).reshape(n, 9)
                fake_score, ds3 = self.disc.apply(
                    _cd(disc_params), disc_state_after, _cd(bps),
                    _cd(rot_mat_flat), _cd(yf.transl), _cd(yf.joint_conf),
                    train=True, return_logits=not cfg.is_wgan)
                fake_score, ds3 = _f(fake_score), _f(ds3)
                if cfg.is_wgan:
                    adv = -jnp.mean(fake_score)
                else:
                    adv = cfg.bce_weight * bce_logits(
                        fake_score, jnp.ones_like(fake_score))
                transl_l2, rot_l2 = self._recon_losses(
                    yf.rot_6d, yf.transl, real_rot_flat, real_transl)
                conf_l2 = jnp.mean((yf.joint_conf - real_joints) ** 2)
                logs = {
                    "gen_loss_fake": adv,
                    "transl_loss": cfg.transl_coef * transl_l2,
                    "rot_loss": cfg.rot_coef * rot_l2,
                    "conf_loss": cfg.conf_coef * conf_l2,
                }
                total = adv + logs["transl_loss"] + logs["rot_loss"] + logs["conf_loss"]
                if cfg.ms_coef:
                    # mode-seeking term: second z draw on the same bps rows;
                    # BN state of the extra forward is discarded (the
                    # regularizer must not perturb running-stat parity)
                    z2 = jax.random.normal(
                        jax.random.fold_in(key, 0x6d73),  # 'ms'
                        z.shape, jnp.float32)
                    yf2, _ = self.gen.apply(_cg(gen_params), ts.gen_state,
                                            _cg(z2), _cg(bps), train=True)
                    yf2 = _f(yf2)
                    g1 = jnp.concatenate(
                        [yf.rot_6d, yf.transl, yf.joint_conf], axis=-1)
                    g2 = jnp.concatenate(
                        [yf2.rot_6d, yf2.transl, yf2.joint_conf], axis=-1)
                    num = jnp.mean(jnp.abs(g1 - g2), axis=-1)
                    den = jnp.mean(jnp.abs(z - z2), axis=-1)
                    ratio = num / jnp.maximum(den, 1e-8)
                    logs["ms_loss"] = cfg.ms_coef * jnp.mean(
                        1.0 / (ratio + 1e-5))
                    total = total + logs["ms_loss"]
                logs["total_loss_gen"] = total
                return total, (gs, ds3, logs)

            (gen_grads, (gen_state_after, disc_state_after, gen_logs)) = \
                jax.grad(gen_loss_fn, has_aux=True)(ts.gen_params)
            gen_updates, gen_opt = self.gen_tx.update(
                gen_grads, ts.gen_opt, ts.gen_params)
            gen_params = optax.apply_updates(ts.gen_params, gen_updates)
        else:
            gen_params, gen_opt = ts.gen_params, ts.gen_opt
            gen_logs = {}

        logs = {**disc_logs, **gen_logs}
        new_ts = GanTrainState(
            gen_params=gen_params, gen_state=gen_state_after,
            disc_params=disc_params, disc_state=disc_state_after,
            gen_opt=gen_opt, disc_opt=disc_opt, step=ts.step + 1)
        return new_ts, logs

    @functools.partial(jax.jit, static_argnames=("self",))
    def evaluator_step(self, ts: EvaluatorTrainState,
                       batch: Dict[str, jax.Array], key: jax.Array
                       ) -> Tuple[EvaluatorTrainState, Dict[str, jax.Array]]:
        """One update_dexevaluator step (dexgangrasp.py:739-755): BCE on
        success labels.  batch adds 'label' (B,)."""
        return self.evaluator_step_body(ts, batch, key)

    def evaluator_step_body(self, ts: EvaluatorTrainState,
                            batch: Dict[str, jax.Array], key: jax.Array
                            ) -> Tuple[EvaluatorTrainState,
                                       Dict[str, jax.Array]]:
        """Un-jitted evaluator step body (scanned by train/fast.py)."""
        cfg = self.cfg
        bps = batch["bps_object"].astype(jnp.float32)
        n = bps.shape[0]
        rot_flat = batch["rot_matrix"].astype(jnp.float32).reshape(n, 9)
        transl = batch["transl"].astype(jnp.float32)
        label = batch["label"].astype(jnp.float32).reshape(n, 1)

        def loss_fn(params):
            logits, s = self.eva.apply(params, ts.state, bps, rot_flat,
                                       transl, train=True, dropout_key=key,
                                       return_logits=True)
            loss = cfg.bce_weight * bce_logits(logits, label)
            return loss, (s, loss)

        (grads, (new_state, loss)) = jax.grad(loss_fn, has_aux=True)(ts.params)
        updates, opt = self.eva_tx.update(grads, ts.opt, ts.params)
        params = optax.apply_updates(ts.params, updates)
        logs = {"total_loss_eva": loss, "bce_loss": loss}
        return (EvaluatorTrainState(params=params, state=new_state, opt=opt,
                                    step=ts.step + 1), logs)

    # ---------------------------------------------------------- eval steps

    @functools.partial(jax.jit, static_argnames=("self",))
    def eval_gan_losses(self, ts: GanTrainState, batch: Dict[str, jax.Array],
                        key: jax.Array) -> Dict[str, jax.Array]:
        """Eval-split generator losses (reference
        eval_dexgangrasp_generator_loss, dexgangrasp.py:334-365):
        eval-mode forwards, no state updates."""
        cfg = self.cfg
        bps = batch["bps_object"].astype(jnp.float32)
        n = bps.shape[0]
        real_rot_flat = batch["rot_matrix"].astype(jnp.float32).reshape(n, 9)
        real_transl = batch["transl"].astype(jnp.float32)
        real_joints = batch["joint_conf"].astype(jnp.float32)
        z = jax.random.normal(key, (n, cfg.latent_dim), jnp.float32)
        yf, _ = self.gen.apply(ts.gen_params, ts.gen_state, z, bps, train=False)
        rot_mat_flat = rot_matrix_from_ortho6d(yf.rot_6d).reshape(n, 9)
        fake_score, _ = self.disc.apply(
            ts.disc_params, ts.disc_state, bps, rot_mat_flat, yf.transl,
            yf.joint_conf, train=False, return_logits=not cfg.is_wgan)
        if cfg.is_wgan:
            adv = -jnp.mean(fake_score)
        else:
            adv = cfg.bce_weight * bce_logits(fake_score,
                                              jnp.ones_like(fake_score))
        transl_l2, rot_l2 = self._recon_losses(
            yf.rot_6d, yf.transl, real_rot_flat, real_transl)
        conf_l2 = jnp.mean((yf.joint_conf - real_joints) ** 2)
        logs = {
            "gen_loss_fake": adv,
            "transl_loss": cfg.transl_coef * transl_l2,
            "rot_loss": cfg.rot_coef * rot_l2,
            "conf_loss": cfg.conf_coef * conf_l2,
        }
        logs["total_loss_gen"] = (adv + logs["transl_loss"] + logs["rot_loss"]
                                  + logs["conf_loss"])
        return logs

    @functools.partial(jax.jit, static_argnames=("self",))
    def eval_evaluator(self, ts: EvaluatorTrainState,
                       batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        """Eval-split evaluator loss + accuracy (dexgangrasp.py:309-332)."""
        bps = batch["bps_object"].astype(jnp.float32)
        n = bps.shape[0]
        rot_flat = batch["rot_matrix"].astype(jnp.float32).reshape(n, 9)
        transl = batch["transl"].astype(jnp.float32)
        label = batch["label"].astype(jnp.float32).reshape(n, 1)
        p, _ = self.eva.apply(ts.params, ts.state, bps, rot_flat, transl,
                              train=False)
        loss = self.cfg.bce_weight * bce(p, label)
        pred_label = class_labels_from_logits(p, 0.5)
        tp, tn, acc = accuracy_evaluator(pred_label, label)
        return {"total_loss_eva": loss, "bce_loss": loss,
                "tp_rate": tp, "tn_rate": tn, "accuracy": acc,
                "pred_label": pred_label[:, 0], "gt_label": label[:, 0]}
