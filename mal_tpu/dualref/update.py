"""DEQ update block (DualRefine `SmallUpdateBlock`,
`dualrefine/networks/update.py`).

Motion encoder over (cost, depth), ConvGRU with global-context gating, depth
delta head, convex-upsample mask head, evolving pose-weight head. Weight
normalization (the reference's `_wnorm`, from the missing DEQ lib) is a
`WNConv` reparameterization w = g * v / ||v|| — purely functional, no
reset() dance needed.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class WNConv(nn.Module):
    """Weight-normalized conv (dim-0 norm like torch weight_norm(dim=0))."""
    features: int
    kernel: tuple[int, int] = (3, 3)
    padding: int = 1
    use_wnorm: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kh, kw = self.kernel
        cin = x.shape[-1]
        v = self.param("v", nn.initializers.lecun_normal(),
                       (kh, kw, cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.use_wnorm:
            g = self.param("g", nn.initializers.ones, (self.features,))
            norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2), keepdims=True) + 1e-12)
            w = g * v / norm
        else:
            w = v
        pad = ((self.padding, self.padding),) * 2
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")) + b


class ConvGRU(nn.Module):
    """GRU with global-context gating (`update.py:37-83`)."""
    hidden_dim: int = 96
    use_wnorm: bool = True

    @nn.compact
    def __call__(self, h: Array, x: Array) -> Array:
        hd = self.hidden_dim
        wn = self.use_wnorm
        glo = nn.sigmoid(WNConv(hd, (1, 1), 0, wn, name="w")(h)) * h
        glo = jnp.mean(glo, axis=(1, 2), keepdims=True)

        zr_net = WNConv(2 * hd, (3, 3), 1, wn, name="conv_net")(h)
        zr_inp = WNConv(2 * hd, (3, 3), 1, wn, name="conv_inp")(x)
        z_net, r_net = jnp.split(zr_net, 2, axis=-1)
        z_inp, r_inp = jnp.split(zr_inp, 2, axis=-1)

        z = nn.sigmoid(z_net + z_inp + WNConv(hd, (1, 1), 0, wn, name="convz_glo")(glo))
        r = nn.sigmoid(r_net + r_inp + WNConv(hd, (1, 1), 0, wn, name="convr_glo")(glo))
        q = nn.tanh(WNConv(hd, (3, 3), 1, wn, name="convq")(
            jnp.concatenate([r * h, x], axis=-1))
            + WNConv(hd, (1, 1), 0, wn, name="convq_glo")(glo))
        return (1.0 - z) * h + z * q


class SmallMotionEncoder(nn.Module):
    """(depth, cost) -> 64-ch motion features (`update.py:86-122`)."""
    use_wnorm: bool = True

    @nn.compact
    def __call__(self, depths: Array, corr: Array) -> Array:
        wn = self.use_wnorm
        cor = nn.relu(WNConv(96, (1, 1), 0, wn, name="convc1")(corr))
        cor = nn.relu(WNConv(64, (3, 3), 1, wn, name="convc2")(cor))
        dep = nn.relu(WNConv(64, (7, 7), 3, wn, name="convf1")(depths))
        dep = nn.relu(WNConv(32, (3, 3), 1, wn, name="convf2")(dep))
        cor_dep = jnp.concatenate([cor, dep], axis=-1)
        out = nn.relu(WNConv(63, (3, 3), 1, wn, name="conv")(cor_dep))
        return jnp.concatenate([out, depths], axis=-1)


class SmallUpdateBlock(nn.Module):
    """GRU step: (net, inp, corr, depth) -> (net', delta) plus mask/weight
    heads (`update.py:125-162`)."""
    input_dim: int = 64
    hidden_dim: int = 96
    use_wnorm: bool = True
    evolving_pose_weight: bool = True

    def setup(self):
        self.encoder = SmallMotionEncoder(self.use_wnorm, name="encoder")
        self.gru = ConvGRU(self.hidden_dim, self.use_wnorm, name="gru")
        # delta head (ConvHead) — also weight-normalized in the reference
        self.head_conv1 = WNConv(64, (3, 3), 1, self.use_wnorm, name="head_conv1")
        self.head_conv2 = WNConv(1, (3, 3), 1, self.use_wnorm, name="head_conv2")
        # mask / weight heads are NOT weight-normalized (`update.py:132-140`)
        self.mask_conv1 = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)),
                                  name="mask_conv1")
        self.mask_conv2 = nn.Conv(16 * 9, (1, 1), name="mask_conv2")
        if self.evolving_pose_weight:
            self.weight_conv1 = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)),
                                        name="weight_conv1")
            self.weight_conv2 = nn.Conv(1, (1, 1), name="weight_conv2")

    def __call__(self, net: Array, inp: Array, corr: Array, depths: Array):
        motion = self.encoder(depths, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = self.gru(net, x)
        delta = self.head_conv2(nn.relu(self.head_conv1(net)))
        return net, delta

    def upsample_mask(self, net: Array) -> Array:
        return self.mask_conv2(nn.relu(self.mask_conv1(net)))

    def pose_weight(self, net: Array) -> Array:
        return nn.sigmoid(self.weight_conv2(nn.relu(self.weight_conv1(net))))


def convex_upsample_disp(disp: Array, mask: Array, factor: int = 4) -> Array:
    """RAFT convex upsampling x4 (`depth_pose.py:345-360`).

    disp: (B, h, w, 1); mask: (B, h, w, 16*9) from `upsample_mask` (x0.25).
    """
    B, h, w, _ = disp.shape
    mask = 0.25 * mask
    mask = mask.reshape(B, h, w, 9, factor * factor)
    mask = jax.nn.softmax(mask, axis=3)

    # 3x3 neighbourhood unfold of disp
    pad = jnp.pad(disp[..., 0], ((0, 0), (1, 1), (1, 1)))
    patches = jnp.stack([pad[:, dy:dy + h, dx:dx + w]
                         for dy in range(3) for dx in range(3)], axis=-1)
    up = jnp.einsum("bhwk,bhwkf->bhwf", patches, mask)  # (B,h,w,16)
    up = up.reshape(B, h, w, factor, factor)
    up = jnp.moveaxis(up, (3, 4), (2, 4))  # (B, h, factor, w, factor)
    return up.reshape(B, h * factor, w * factor, 1)
