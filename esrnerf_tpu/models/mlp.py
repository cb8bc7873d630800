"""Plain-pytree MLPs for the renderer heads.

The reference's heads are small ``nn.Sequential`` ReLU stacks (RadianceNet /
TonemapNet / BRDFNet / EmissionNet, ``app/utils/pbr/module.py:6-83``; the
coarse color heads at ``voxurfc.py:125-145``). Here a head is just a dict
``{"w0","b0","w1","b1",...}``; ``apply`` runs the matmuls in a configurable
compute dtype (bf16 on the MXU) with fp32 master params.

Init matches ``torch.nn.Linear`` defaults — kaiming_uniform(a=√5), i.e.
``U(-1/√fan_in, 1/√fan_in)`` for both weight and bias — so that training
dynamics track the reference.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

MLPParams = Dict[str, jnp.ndarray]

# Row count above which apply_mlp auto-remats (see apply_mlp docstring).
_REMAT_ROWS = int(os.environ.get("ESR_MLP_REMAT_ROWS", str(256 * 1024)))
# Chunk height for the remat path's lax.map: bounds the backward's
# rematerialized [chunk, hidden] activation temps (f32[128k,192] = 96 MB).
_CHUNK_ROWS = int(os.environ.get("ESR_MLP_REMAT_CHUNK", str(128 * 1024)))

# Trace-time override: under inference_mode() the auto-remat heuristic is
# disabled — remat only pays when a backward would otherwise keep the
# [M, hidden] activations live; on forward-only eval sweeps (eval_emit,
# lts_eval_chunk, relight forwards) the chunked lax.map just serializes
# work that could run as one full-batch stack of matmuls.
_INFERENCE = False


class inference_mode:
    """Context manager: apply_mlp traced inside skips auto-remat.

    Wraps the *call* of a jitted eval function (trace happens on first
    invocation), so eval graphs keep full-batch MLP parallelism while
    train steps — traced outside the context — keep the HBM-saving remat.
    """

    def __enter__(self):
        global _INFERENCE
        self._old = _INFERENCE
        _INFERENCE = True
        return self

    def __exit__(self, *exc):
        global _INFERENCE
        _INFERENCE = self._old
        return False


def mlp_dtype_from_cfg(cfg):
    """MXU compute dtype for the renderer heads from system.compute_dtype:
    bf16 matmuls with fp32 master params + fp32 accumulate (default; the
    reference's torch Linears run TF32 on Ampere, so reduced-precision
    compute is the parity norm — pipeline-e2e PSNR thresholds gate it).
    'float32' disables."""
    val = str(cfg.system.get("compute_dtype") or "bfloat16")
    return jnp.bfloat16 if val == "bfloat16" else None


def init_mlp(
    key: jax.Array,
    dims: Sequence[int],
    zero_final_bias: bool = False,
    dtype=jnp.float32,
) -> MLPParams:
    """dims = [in, hidden..., out]."""
    params: MLPParams = {}
    n_layers = len(dims) - 1
    keys = jax.random.split(key, n_layers * 2)
    for i in range(n_layers):
        fan_in = dims[i]
        bound = 1.0 / jnp.sqrt(fan_in)
        params[f"w{i}"] = jax.random.uniform(
            keys[2 * i], (dims[i], dims[i + 1]), dtype, -bound, bound
        )
        if zero_final_bias and i == n_layers - 1:
            params[f"b{i}"] = jnp.zeros((dims[i + 1],), dtype)
        else:
            params[f"b{i}"] = jax.random.uniform(
                keys[2 * i + 1], (dims[i + 1],), dtype, -bound, bound
            )
    return params


def n_layers(params: MLPParams) -> int:
    return sum(1 for k in params if k.startswith("w"))


def apply_mlp(
    params: MLPParams,
    x: jnp.ndarray,
    final_activation=None,
    compute_dtype: Optional[jnp.dtype] = None,
    remat: Optional[bool] = None,
) -> jnp.ndarray:
    """ReLU MLP; optional final activation; optional bf16 compute.

    ``remat`` (default: auto, on for >= ESR_MLP_REMAT_ROWS rows) wraps the
    stack in ``jax.checkpoint`` so backward recomputes the hidden
    activations instead of keeping them live. At the LTS/PDRA secondary
    fan-out (~1M rows x 4-6 heads) the saved [M, hidden] f32 temps are
    ~0.75 GB EACH — the PDRA train step exceeded 16 GB HBM by 1.7 GB from
    exactly these (XLA's own rematerializer still kept six alive), while
    the recompute is a few extra tiny-matmul passes on an otherwise idle
    MXU."""
    if remat is None:
        remat = (not _INFERENCE) and x.ndim == 2 and x.shape[0] >= _REMAT_ROWS
    if remat:
        fn = jax.checkpoint(
            lambda p, y: apply_mlp(p, y, final_activation, compute_dtype,
                                   remat=False))
        M = x.shape[0]
        if x.ndim == 2 and M > _CHUNK_ROWS:
            # lax.map over fixed-height chunks: the checkpoint backward
            # then rematerializes one chunk's activations at a time
            # instead of the whole [M, hidden] stack at once (the PDRA
            # fan-out still held ~2.3 GB of per-head remat temps with a
            # single checkpoint over M=2^20). Row-wise identical; only
            # the dw accumulation order changes (f32 adds). The ragged
            # tail runs as one separate call instead of padding x — a
            # jnp.pad here would transiently duplicate the [M, D] input.
            K = M // _CHUNK_ROWS
            body = x[: K * _CHUNK_ROWS]
            out = jax.lax.map(
                lambda y: fn(params, y),
                body.reshape(K, _CHUNK_ROWS, x.shape[1]))
            out = out.reshape(K * _CHUNK_ROWS, -1)
            if M > K * _CHUNK_ROWS:
                tail = fn(params, x[K * _CHUNK_ROWS:])
                out = jnp.concatenate([out, tail], axis=0)
            return out
        return fn(params, x)
    L = n_layers(params)
    out_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    for i in range(L):
        w, b = params[f"w{i}"], params[f"b{i}"]
        if compute_dtype is not None:
            w = w.astype(compute_dtype)
            b = b.astype(compute_dtype)
        x = jnp.dot(x, w, preferred_element_type=jnp.float32) + b.astype(jnp.float32)
        if i < L - 1:
            x = jax.nn.relu(x)
        if compute_dtype is not None and i < L - 1:
            x = x.astype(compute_dtype)
    x = x.astype(out_dtype)
    if final_activation is not None:
        x = final_activation(x)
    return x
