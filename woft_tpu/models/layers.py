"""Functional NN primitives (NHWC, param pytrees keyed like torch modules).

Parameters live in nested dicts whose keys mirror the reference checkpoints'
``state_dict`` names (``fnet.layer1.0.conv1.weight`` -> params['fnet']
['layer1']['0']['conv1']['weight']); conv kernels are stored HWIO. This makes
the ``.pth`` converter a pure re-keying/transpose pass
(ref:pytracking/optical_flow/raft.py:54-69) while the forward functions stay
idiomatic JAX.

Norm semantics match torch eval mode:
- InstanceNorm2d: affine=False, always uses per-sample spatial statistics.
- BatchNorm2d: eval uses running statistics.
- GroupNorm: affine, group statistics.
"""

import contextlib
import math

import jax
import jax.numpy as jnp

# Precision for convolutions / matmuls. 'highest' gives fp32 MXU passes for
# parity; bench configs may relax this module-wide.
_PRECISION = jax.lax.Precision.HIGHEST
# When set (jnp.bfloat16), conv inputs/kernels are cast to it and the MXU
# runs native bf16 passes with f32 accumulation (outputs stay f32).
_COMPUTE_DTYPE = None


def set_precision(precision, compute_dtype=None):
    """Set module-wide conv/dot precision ('highest' for parity, 'default'
    to let the MXU use bf16 passes) and optional bf16 compute dtype."""
    global _PRECISION, _COMPUTE_DTYPE
    _PRECISION = (jax.lax.Precision(precision)
                  if not isinstance(precision, jax.lax.Precision)
                  else precision)
    _COMPUTE_DTYPE = compute_dtype


def get_precision():
    return _PRECISION


def get_compute_dtype():
    return _COMPUTE_DTYPE


@contextlib.contextmanager
def precision_scope(precision, compute_dtype=None):
    """``set_precision`` bounded to a scope: restores the previous state on
    exit so one traced forward (e.g. a bf16-config model) cannot leak its
    precision into unrelated later code (observed: a bf16 forward in one
    test degraded f32 encoder parity in another)."""
    global _PRECISION, _COMPUTE_DTYPE
    prev = (_PRECISION, _COMPUTE_DTYPE)
    set_precision(precision, compute_dtype)
    try:
        yield
    finally:
        _PRECISION, _COMPUTE_DTYPE = prev


def conv2d(p, x, stride=1, padding=0, dtype=None, out_dtype=None):
    """2-D convolution, torch-compatible explicit padding.

    Args:
        p: {'weight': (Kh, Kw, Cin, Cout), 'bias': (Cout,) [optional]}.
        x: (N, H, W, Cin).
        stride: int or (sh, sw).
        padding: int or (ph, pw) zero padding on both sides.
        out_dtype: optional storage dtype for the result. Accumulation is
            always f32; passing bf16 here only rounds the STORED
            activation (the convert fuses into the conv epilogue), which
            halves HBM traffic for every consumer — the encoder uses it
            in bf16 mode, where activation reads/writes, not FLOPs,
            dominate its cost on TPU.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    w = p["weight"]
    dtype = dtype if dtype is not None else _COMPUTE_DTYPE
    if dtype is not None:
        w = w.astype(dtype)
        x = x.astype(dtype)
    if (w.shape[0] == 1 and w.shape[1] == 1 and stride == (1, 1)
            and padding == (0, 0)):
        # 1x1 conv as a plain matmul: direct MXU mapping, and GSPMD
        # partitions dots cleanly where its conv rewrite falls over
        # (batch-sharded conv -> feature_group_count with out=1 channels)
        out = jnp.einsum("nhwi,io->nhwo", x, w[0, 0],
                         precision=_PRECISION,
                         preferred_element_type=jnp.float32)
    else:
        out = jax.lax.conv_general_dilated(
            x, w,
            window_strides=stride,
            padding=((padding[0], padding[0]), (padding[1], padding[1])),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=_PRECISION,
            preferred_element_type=jnp.float32)
    if "bias" in p and p["bias"] is not None:
        out = out + p["bias"].astype(out.dtype)
    if out_dtype is not None:
        out = out.astype(out_dtype)
    return out


def instance_norm(x, eps=1e-5):
    """torch InstanceNorm2d(affine=False) twin: per-(n, c) spatial stats.

    Statistics always accumulate in f32 (the convert fuses into the
    reduction); the output keeps the input's dtype so bf16 encoder
    activations stay bf16 through the norm."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.var(xf, axis=(1, 2), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def batch_norm_eval(p, x, eps=1e-5):
    """torch BatchNorm2d eval twin: running statistics + affine."""
    rm = p["running_mean"]
    rv = p["running_var"]
    scale = p["weight"] * jax.lax.rsqrt(rv + eps)
    return (x * scale + (p["bias"] - rm * scale)).astype(x.dtype)


def group_norm(p, x, num_groups, eps=1e-5):
    """torch GroupNorm twin (affine)."""
    N, H, W, C = x.shape
    g = x.reshape(N, H, W, num_groups, C // num_groups).astype(jnp.float32)
    mean = jnp.mean(g, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(g, axis=(1, 2, 4), keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + eps)
    y = g.reshape(N, H, W, C) * p["weight"] + p["bias"]
    return y.astype(x.dtype)


def apply_norm(p, x, norm_fn, num_groups=None):
    """Dispatch over the reference's norm_fn strings
    (ref:raft_core/extractor.py:16-38)."""
    if norm_fn == "none":
        return x
    if norm_fn == "instance":
        return instance_norm(x)
    if norm_fn == "batch":
        return batch_norm_eval(p, x)
    if norm_fn == "group":
        return group_norm(p, x, num_groups)
    raise ValueError(f"unknown norm_fn {norm_fn}")


def relu(x):
    return jnp.maximum(x, 0)


# ---------------------------------------------------------------------------
# initialisation (for training-from-scratch; checkpoints come via convert.py)
# ---------------------------------------------------------------------------

def init_conv(key, kh, kw, cin, cout, kaiming_out=False, bias=True):
    """Conv init. ``kaiming_out=True`` = kaiming_normal fan_out/relu as in
    the reference encoders (ref:raft_core/extractor.py:150-152); otherwise
    torch's default Conv2d init (kaiming_uniform a=sqrt(5) + uniform bias).
    """
    wkey, bkey = jax.random.split(key)
    if kaiming_out:
        fan_out = kh * kw * cout
        std = math.sqrt(2.0 / fan_out)
        w = std * jax.random.normal(wkey, (kh, kw, cin, cout))
    else:
        fan_in = kh * kw * cin
        gain = math.sqrt(2.0 / (1 + 5.0))       # a = sqrt(5)
        bound = gain * math.sqrt(3.0 / fan_in)
        w = jax.random.uniform(wkey, (kh, kw, cin, cout), minval=-bound,
                               maxval=bound)
    p = {"weight": w}
    if bias:
        fan_in = kh * kw * cin
        bound = 1.0 / math.sqrt(fan_in)
        p["bias"] = jax.random.uniform(bkey, (cout,), minval=-bound,
                                       maxval=bound)
    return p


def init_norm(norm_fn, channels):
    """Norm params (weight=1, bias=0, running stats identity) — matches the
    reference's constant init (ref:raft_core/extractor.py:153-157)."""
    if norm_fn == "batch":
        # (num_batches_tracked is intentionally absent: integer leaves are
        # useless at eval and break jax.grad)
        return {"weight": jnp.ones(channels), "bias": jnp.zeros(channels),
                "running_mean": jnp.zeros(channels),
                "running_var": jnp.ones(channels)}
    if norm_fn == "group":
        return {"weight": jnp.ones(channels), "bias": jnp.zeros(channels)}
    return {}
