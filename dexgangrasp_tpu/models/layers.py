"""Functional building blocks with PyTorch-compatible semantics.

Everything is a plain pytree of arrays: ``params`` hold trainables,
``state`` holds BatchNorm running statistics.  Apply functions are pure;
train-mode BN returns the updated state (the caller threads it).

Torch-parity details this module commits to (needed so real reference
checkpoints — legacy ``ffh*`` key naming, ``dexgangrasp.py:662-712`` — can
be imported and reproduce outputs bit-near):

- BatchNorm1d: eps 1e-5, momentum 0.1; normalization uses *biased* batch
  variance, the running-var update uses the *unbiased* variance; eval mode
  uses running stats.
- Linear weights are stored (in, out) — transposed from torch's (out, in).
- LeakyReLU slope 0.2 (reference ``networks.py:41``).
- ResBlock topology per reference ``networks.py:26-56``: hidden width 256,
  skip projection fc3 only when Fin != Fout, final nonlinearity optional.
- Initialization per reference ``dexgangrasp.py:39-62``: xavier-normal
  (gain 0.02) on Linear/Conv weights, N(1, 0.02) on BN weight, zeros on BN
  bias; Linear bias keeps torch's default U(-1/sqrt(fan_in), +...).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

LRELU_SLOPE = 0.2
BN_EPS = 1e-5
BN_MOMENTUM = 0.1


def leaky_relu(x: jax.Array) -> jax.Array:
    return jax.nn.leaky_relu(x, LRELU_SLOPE)


# ------------------------------------------------------------------ Linear


def linear_init(key: jax.Array, fan_in: int, fan_out: int,
                init: str = "xavier", gain: float = 0.02,
                dtype=jnp.float32) -> dict:
    kw, kb = jax.random.split(key)
    if init == "xavier":
        std = gain * math.sqrt(2.0 / (fan_in + fan_out))
        w = std * jax.random.normal(kw, (fan_in, fan_out), dtype)
    elif init == "normal":
        w = gain * jax.random.normal(kw, (fan_in, fan_out), dtype)
    elif init == "kaiming":
        std = math.sqrt(2.0 / fan_in)
        w = std * jax.random.normal(kw, (fan_in, fan_out), dtype)
    elif init == "torch_default":
        bound = 1.0 / math.sqrt(fan_in)
        w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
    else:
        raise NotImplementedError(f"init [{init}] is not implemented")
    # torch Linear bias default: U(-1/sqrt(fan_in), +1/sqrt(fan_in));
    # the reference's init_func leaves biases at this default.
    bbound = 1.0 / math.sqrt(fan_in)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bbound, bbound)
    return {"w": w, "b": b}


def linear_apply(p: dict, x: jax.Array) -> jax.Array:
    return x @ p["w"] + p["b"]


# --------------------------------------------------------------- BatchNorm


def batchnorm_init(n: int, gain: float = 0.02,
                   key: Optional[jax.Array] = None,
                   dtype=jnp.float32) -> Tuple[dict, dict]:
    """Returns (params {scale, bias}, state {mean, var}).

    With ``key`` given, scale ~ N(1, gain) per the reference init
    (``dexgangrasp.py:58-60``); otherwise torch default scale=1.
    """
    if key is not None:
        scale = 1.0 + gain * jax.random.normal(key, (n,), dtype)
    else:
        scale = jnp.ones((n,), dtype)
    params = {"scale": scale, "bias": jnp.zeros((n,), dtype)}
    state = {"mean": jnp.zeros((n,), dtype), "var": jnp.ones((n,), dtype)}
    return params, state


def batchnorm_apply(p: dict, s: dict, x: jax.Array, train: bool
                    ) -> Tuple[jax.Array, dict]:
    """BatchNorm1d over axis 0. Returns (y, new_state).

    Batch statistics are always accumulated in f32 — a no-op for the
    (default) f32 path, and the load-bearing precision fix for bf16
    mixed-precision training: bf16 mean/variance over large batches is
    what destabilizes normalization, not the matmuls."""
    if train:
        xs = x.astype(jnp.float32)
        mean = jnp.mean(xs, axis=0)
        var = jnp.mean((xs - mean) ** 2, axis=0)  # biased, to normalize
        n = x.shape[0]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - BN_MOMENTUM) * s["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * s["var"] + BN_MOMENTUM * unbiased,
        }
        mean, var = mean.astype(x.dtype), var.astype(x.dtype)
    else:
        mean, var = s["mean"], s["var"]
        new_state = s
    inv = jax.lax.rsqrt(var + BN_EPS)
    y = (x - mean) * inv * p["scale"] + p["bias"]
    return y, new_state


def batchnorm_affine(p: dict, s: dict) -> Tuple[jax.Array, jax.Array]:
    """Eval-mode BN as (k, b): y = k*x + b.  Used by the inference folding
    pass (engine/folding.py) to eliminate BN from the hot path."""
    k = p["scale"] * jax.lax.rsqrt(s["var"] + BN_EPS)
    return k, p["bias"] - s["mean"] * k


# ---------------------------------------------------------------- ResBlock


def resblock_init(key: jax.Array, fin: int, fout: int, hidden: int = 256,
                  init: str = "xavier", gain: float = 0.02) -> Tuple[dict, dict]:
    ks = jax.random.split(key, 5)
    params = {
        "fc1": linear_init(ks[0], fin, hidden, init, gain),
        "fc2": linear_init(ks[1], hidden, fout, init, gain),
    }
    bn1_p, bn1_s = batchnorm_init(hidden, gain, ks[3])
    bn2_p, bn2_s = batchnorm_init(fout, gain, ks[4])
    params["bn1"], params["bn2"] = bn1_p, bn2_p
    state = {"bn1": bn1_s, "bn2": bn2_s}
    if fin != fout:
        params["fc3"] = linear_init(ks[2], fin, fout, init, gain)
    return params, state


def resblock_apply(p: dict, s: dict, x: jax.Array, train: bool,
                   final_nl: bool = True) -> Tuple[jax.Array, dict]:
    """Reference networks.py:43-56 topology."""
    if "fc3" in p:
        xin = leaky_relu(linear_apply(p["fc3"], x))
    else:
        xin = x
    h = linear_apply(p["fc1"], x)
    h, bn1_s = batchnorm_apply(p["bn1"], s["bn1"], h, train)
    h = leaky_relu(h)
    h = linear_apply(p["fc2"], h)
    h, bn2_s = batchnorm_apply(p["bn2"], s["bn2"], h, train)
    out = xin + h
    if final_nl:
        out = leaky_relu(out)
    return out, {"bn1": bn1_s, "bn2": bn2_s}


def dropout(key: Optional[jax.Array], x: jax.Array, rate: float,
            train: bool) -> jax.Array:
    if not train or rate <= 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
