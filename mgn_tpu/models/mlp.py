"""Functional MLP building block (init + apply on plain pytrees).

Parameters are plain nested dicts so they shard with ``jax.sharding`` trees,
checkpoint with orbax, and compare 1:1 against the NumPy golden oracle in
tests.  Matches the reference MLP shape contract: ``hidden_layers`` hidden
layers of ``layer_size`` units, ReLU, optional LayerNorm on the output
(model sizing wired at /root/reference/src/MeshGraphNets.jl:282-285).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

__all__ = ["init_mlp", "apply_mlp", "apply_mlp_parts"]


def _glorot_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[1]
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def init_mlp(
    key: jax.Array,
    in_dim: int,
    latent_size: int,
    hidden_layers: int,
    out_dim: int,
    layer_norm: bool = True,
) -> Dict[str, Any]:
    """Initialize an MLP: ``hidden_layers`` hidden layers + linear output.

    Glorot-uniform weights / zero biases (the Lux.jl Dense default the
    reference inherits).
    """
    dims = [in_dim] + [latent_size] * hidden_layers + [out_dim]
    keys = jax.random.split(key, len(dims) - 1)
    params: Dict[str, Any] = {
        "w": [_glorot_uniform(k, (dims[i], dims[i + 1])) for i, k in enumerate(keys)],
        "b": [jnp.zeros((dims[i + 1],), jnp.float32) for i in range(len(dims) - 1)],
    }
    if layer_norm:
        params["ln_scale"] = jnp.ones((out_dim,), jnp.float32)
        params["ln_bias"] = jnp.zeros((out_dim,), jnp.float32)
    return params


def apply_mlp_parts(
    params: Dict[str, Any], parts, compute_dtype=jnp.float32, extra=None
) -> jax.Array:
    """Forward pass on a conceptual ``concat(parts, -1)`` input WITHOUT
    materializing the concatenation: the first-layer weight matrix is sliced
    per part and the contributions summed (``[a,b,c] @ W == a@Wa + b@Wb +
    c@Wc``).  Saves an HBM round-trip of the wide concat buffer per call —
    the processor blocks call this 2x per round.  ``extra``: optional f32
    pre-activation offset added before the first bias (a pre-computed
    first-layer partial sum — the multi-edge-set fast path)."""
    w0 = params["w"][0]
    h = None if extra is None else extra.astype(jnp.float32)
    off = 0
    for p in parts:
        d = p.shape[-1]
        contrib = jnp.dot(
            p.astype(compute_dtype),
            w0[off : off + d].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        h = contrib if h is None else h + contrib
        off += d
    assert off == w0.shape[0], (off, w0.shape)
    h = h.astype(compute_dtype) + params["b"][0].astype(compute_dtype)
    n = len(params["w"])
    for i in range(1, n):
        h = jax.nn.relu(h)
        w = params["w"][i].astype(compute_dtype)
        b = params["b"][i].astype(compute_dtype)
        h = jnp.dot(h, w, preferred_element_type=jnp.float32).astype(compute_dtype) + b
    if "ln_scale" in params:
        h = _layer_norm(h, params)
    return h


def _layer_norm(h, params):
    h32 = h.astype(jnp.float32)
    mean = jnp.mean(h32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h32 - mean), axis=-1, keepdims=True)
    h32 = (h32 - mean) * jax.lax.rsqrt(var + 1e-5)
    return (h32 * params["ln_scale"] + params["ln_bias"]).astype(h.dtype)


def apply_mlp(
    params: Dict[str, Any], x: jax.Array, compute_dtype=jnp.float32
) -> jax.Array:
    """Forward pass. Matmuls run in ``compute_dtype`` (bf16 on TPU for speed);
    LayerNorm statistics are always float32."""
    h = x.astype(compute_dtype)
    n = len(params["w"])
    for i in range(n):
        w = params["w"][i].astype(compute_dtype)
        b = params["b"][i].astype(compute_dtype)
        h = jnp.dot(h, w, preferred_element_type=jnp.float32).astype(compute_dtype) + b
        if i < n - 1:
            h = jax.nn.relu(h)
    if "ln_scale" in params:
        h32 = h.astype(jnp.float32)
        mean = jnp.mean(h32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(h32 - mean), axis=-1, keepdims=True)
        h32 = (h32 - mean) * jax.lax.rsqrt(var + 1e-5)
        h = (h32 * params["ln_scale"] + params["ln_bias"]).astype(compute_dtype)
    return h
