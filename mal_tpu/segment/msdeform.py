"""Multi-scale deformable attention (pure JAX; the CUDA extension's TPU twin).

The reference ships a 1.7k-LoC CUDA im2col kernel
(`mask2former/modeling/pixel_decoder/ops/src/cuda/ms_deform_im2col_cuda.cuh`)
plus a pure-torch fallback (`ops/functions/ms_deform_attn_func.py:52-72`).
Here the op is a batched bilinear gather over the flattened level features —
XLA lowers it to TPU gathers and fuses the weighting/summation; a Pallas
version can slot in behind the same signature.

Semantics match the reference: sampling locations are normalized to [0, 1]
per level, sampled with *zeros* padding and align_corners=False, weighted by
softmax attention weights over (levels x points).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mal_tpu.ops.interp import grid_sample

Array = jax.Array


def ms_deform_attn_core_per_level(
        value: Array, spatial_shapes: list[tuple[int, int]],
        sampling_locations: Array, attention_weights: Array) -> Array:
    """Reference-shaped formulation: one grid_sample per level (kept as the
    equivalence oracle for the consolidated path below)."""
    B, _, H_, C = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape

    # static split points (np, not jnp: a traced cumsum would make the split
    # sizes abstract under jit)
    splits = np.cumsum([h * w for h, w in spatial_shapes])[:-1].tolist()
    values = jnp.split(value, splits, axis=1)

    out = 0.0
    for lvl, (h, w) in enumerate(spatial_shapes):
        # fold heads into the batch: each head samples its own value slice
        v = values[lvl].reshape(B, h, w, H_, C)
        v = jnp.moveaxis(v, 3, 1).reshape(B * H_, h, w, C)
        # [0,1] -> [-1,1] (align_corners=False convention)
        g = 2.0 * sampling_locations[:, :, :, lvl] - 1.0  # (B, Lq, heads, P, 2)
        g = g.transpose(0, 2, 1, 3, 4).reshape(B * H_, Lq, P, 2)
        sampled = grid_sample(v, g, padding_mode="zeros", align_corners=False)
        sampled = sampled.reshape(B, H_, Lq, P, C)
        w_l = attention_weights[:, :, :, lvl]  # (B, Lq, heads, P)
        out = out + jnp.einsum("bhlpc,blhp->blhc", sampled, w_l)
    return out.reshape(B, Lq, H_ * C)


def _level_value_mats(value: Array, spatial_shapes, G: int, C: int):
    """Transposed level values: vm[g, r*C + c, k] = V[r, k, c]."""
    splits = np.cumsum([h * w for h, w in spatial_shapes])[:-1].tolist()
    values = jnp.split(jnp.moveaxis(value, 2, 1), splits, axis=2)
    vms = []
    for lvl, (h_l, w_l) in enumerate(spatial_shapes):
        v = values[lvl].reshape(G, h_l, w_l, C)
        vms.append(v.transpose(0, 1, 3, 2).reshape(G, h_l * C, w_l))
    return vms


def ms_deform_attn_core_pallas(value: Array,
                               spatial_shapes: list[tuple[int, int]],
                               sampling_locations: Array,
                               attention_weights: Array,
                               interpret: bool = False,
                               mxu_precision: str = "high") -> Array:
    """Gather-free formulation (v4): TPU gathers are index-rate-bound at
    ~80M idx/s (~37 ms per encoder layer at 192x640), but the
    per-(batch, head) level maps are VMEM-sized, so sampling runs as
    separable one-hot MXU contractions instead
    (`mal_tpu/ops/pallas/deform_sample.py`, all three levels fused in one
    kernel, corner math in-kernel). Exact bilinear semantics (zeros
    padding, align_corners=False). v4 moves the points dim into the Pallas
    grid: the P-sum accumulates in VMEM and the kernel emits (G, C, Lq)
    directly, killing the 126 MB (G, T, C, S) intermediate + P-sum + two
    transposes that dominated v3's measured layer cost (9.25 ms -> the
    kernel's ~3.5 ms + one transpose each side; benchmarks/HISTORY.md
    round-4 entry)."""
    from mal_tpu.ops.pallas.deform_sample import (QUERY_TILE,
                                                 deform_sample_fused_v4)

    B, S, H_, C = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == 3, "fused kernel is specialized to 3 pyramid levels"
    G = B * H_

    vms = _level_value_mats(value, spatial_shapes, G, C)

    Tq = -(-Lq // QUERY_TILE)
    padq = Tq * QUERY_TILE - Lq

    def lay(a):  # (B, Lq, H_, L, P) -> (G, P, Tq, L, Sq), query-major
        # one big transpose (minor dim Lq=2520, contiguous) + one tiny
        # (Tq, L) permutation with the Sq minor intact
        a = a.transpose(0, 2, 4, 3, 1).reshape(G, P, L, Lq)
        a = jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, padq)))
        return a.reshape(G, P, L, Tq, QUERY_TILE).swapaxes(2, 3)

    # padded tail queries carry aw=0 -> their A columns are all-zero
    sampled = deform_sample_fused_v4(
        vms[0], vms[1], vms[2],
        lay(sampling_locations[..., 0]), lay(sampling_locations[..., 1]),
        lay(attention_weights),
        shapes=tuple(spatial_shapes), ch=C, n_points=P, interpret=interpret,
        mxu_precision=mxu_precision)

    # (G, Tq, C, Sq) -> (B, Lq, H*C): free reshapes + ONE transpose
    out = sampled.reshape(B, H_, Tq, C, QUERY_TILE)
    out = out.transpose(0, 2, 4, 1, 3)        # (B, Tq, Sq, H, C)
    return out.reshape(B, Tq * QUERY_TILE, H_ * C)[:, :Lq]


def ms_deform_attn_core(value: Array, spatial_shapes: list[tuple[int, int]],
                        sampling_locations: Array, attention_weights: Array,
                        mxu_precision: str = "high") -> Array:
    """value: (B, sum(HW), heads, ch); sampling_locations:
    (B, Lq, heads, L, P, 2) in [0,1]; attention_weights: (B, Lq, heads, L, P).
    Returns (B, Lq, heads*ch). Dispatches to the gather-free Pallas sampler
    on TPU backends; the per-level XLA path is the CPU/test reference.
    mxu_precision="bf16" = the fast-training mode's single-pass bf16
    sampling matmuls (see deform_sample.py)."""
    if jax.default_backend() == "tpu":
        return ms_deform_attn_core_pallas(value, spatial_shapes,
                                          sampling_locations,
                                          attention_weights,
                                          mxu_precision=mxu_precision)
    return ms_deform_attn_core_per_level(value, spatial_shapes,
                                         sampling_locations,
                                         attention_weights)


class MSDeformAttn(nn.Module):
    """Deformable attention module (`ops/modules/ms_deform_attn.py`)."""
    d_model: int = 256
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    mxu_precision: str = "high"  # "bf16" = fast-training sampling matmuls

    @nn.compact
    def __call__(self, query: Array, reference_points: Array, value_flat: Array,
                 spatial_shapes: list[tuple[int, int]]) -> Array:
        """query: (B, Lq, C); reference_points: (B, Lq, L, 2) in [0,1];
        value_flat: (B, sum(HW), C)."""
        B, Lq, C = query.shape
        H_ = self.n_heads
        L, P = self.n_levels, self.n_points

        value = nn.Dense(C, name="value_proj")(value_flat)
        value = value.reshape(B, -1, H_, C // H_)

        offsets = nn.Dense(H_ * L * P * 2, name="sampling_offsets",
                           kernel_init=nn.initializers.zeros)(query)
        offsets = offsets.reshape(B, Lq, H_, L, P, 2)
        attn = nn.Dense(H_ * L * P, name="attention_weights",
                        kernel_init=nn.initializers.zeros)(query)
        attn = jax.nn.softmax(attn.reshape(B, Lq, H_, L * P), axis=-1)
        attn = attn.reshape(B, Lq, H_, L, P)

        # normalize offsets by each level's spatial size
        sizes = jnp.asarray([[w, h] for h, w in spatial_shapes], jnp.float32)
        locs = (reference_points[:, :, None, :, None, :]
                + offsets / sizes[None, None, None, :, None, :])

        out = ms_deform_attn_core(value, spatial_shapes, locs, attn,
                                  mxu_precision=self.mxu_precision)
        return nn.Dense(C, name="output_proj")(out)
