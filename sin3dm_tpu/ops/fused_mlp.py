"""Pallas TPU kernel: fused skip-concat MLP over a stream of points.

The decoder heads (`DecoderMLPSkipConcat`, reference `blocks.py:65-91`)
are applied to millions of points during dense grid decode and texture
baking.  As separate XLA matmuls, every layer writes its [N, hidden]
activation back to HBM; with hidden=256 and N=16.7M (a 256^3 grid) that is
~100 GB of intermediate HBM traffic per decode.

This kernel keeps ALL layer weights resident in VMEM (~0.6 MB for the
default 64->256x4->out head) and pushes a TILE_N block of points through
every layer before touching HBM again — inputs are read once, outputs
written once.  The MXU does the matmuls (`jnp.dot` with fp32 accumulation).

A pure-XLA fallback (`skip_mlp_reference`) defines the semantics; the
kernel is golden-tested against it (tests/test_fused_mlp.py).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def skip_mlp_reference(params: Dict, x: jax.Array) -> jax.Array:
    """XLA reference semantics (== models.autoencoder._mlp_skip_apply)."""
    h = x
    for lp in params["first"]:
        h = jax.nn.relu(x @ lp["w"] + lp["b"]) if h is x else \
            jax.nn.relu(h @ lp["w"] + lp["b"])
    h = jnp.concatenate([x, h], axis=-1)
    for lp in params["second"][:-1]:
        h = jax.nn.relu(h @ lp["w"] + lp["b"])
    lp = params["second"][-1]
    return h @ lp["w"] + lp["b"]


def _flatten_params(params: Dict):
    """-> (leaves list, n_first) with [w, b] pairs in layer order."""
    leaves = []
    for lp in params["first"]:
        leaves += [lp["w"], lp["b"]]
    for lp in params["second"]:
        leaves += [lp["w"], lp["b"]]
    return leaves, len(params["first"])


def _kernel(n_first: int, n_second: int, mxu_dtype, x_ref, *refs):
    w_refs = refs[:-1]
    out_ref = refs[-1]
    x = x_ref[:]

    def layer(i, h, relu=True):
        w = w_refs[2 * i][:]
        b = w_refs[2 * i + 1][:]
        # mxu_dtype=bfloat16 runs the MXU at full rate (fp32 matmul is
        # 4-8x slower on v5e); accumulation stays fp32 either way
        y = jnp.dot(h.astype(mxu_dtype), w.astype(mxu_dtype),
                    preferred_element_type=jnp.float32) + b
        return jnp.maximum(y, 0.0) if relu else y

    h = x
    for i in range(n_first):
        h = layer(i, h)
    h = jnp.concatenate([x, h], axis=-1)
    for j in range(n_second - 1):
        h = layer(n_first + j, h)
    out_ref[:] = layer(n_first + n_second - 1, h, relu=False)


def _on_cpu() -> bool:
    return jax.default_backend() == "cpu"


def skip_mlp_fused(params: Dict, x: jax.Array, tile_n: int = 1024,
                   interpret: bool = None,
                   mxu_dtype=jnp.float32) -> jax.Array:
    """Fused skip-MLP. x: [N, C_in] (N padded to tile_n internally).

    interpret defaults to True on the CPU backend (pallas CPU only runs in
    interpreter mode — used by the golden tests).  `mxu_dtype=bfloat16`
    casts matmul operands (weights + activations) for full-rate MXU; the
    accumulator and layer outputs stay fp32."""
    if interpret is None:
        interpret = _on_cpu()
    leaves, n_first = _flatten_params(params)
    n_second = len(params["second"])
    N, cin = x.shape
    cout = params["second"][-1]["w"].shape[1]

    pad = (-N) % tile_n
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    n_tiles = (N + pad) // tile_n

    in_specs = [pl.BlockSpec((tile_n, cin), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    # weights: full blocks, identical for every grid step (stay in VMEM)
    for leaf in leaves:
        if leaf.ndim == 2:
            in_specs.append(pl.BlockSpec(leaf.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        else:
            in_specs.append(pl.BlockSpec(leaf.shape, lambda i: (0,),
                                         memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(_kernel, n_first, n_second, mxu_dtype),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_n, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N + pad, cout), jnp.float32),
        interpret=interpret,
    )(x, *leaves)
    return out[:N]
