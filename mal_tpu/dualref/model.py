"""DualRefine: equilibrium joint depth+pose refinement (flax.linen).

Re-design of `dualrefine/networks/depth_pose.py` (`DepthPose` /
`DEQDepthPose`): HRNet trunk + attention decoder produce the initial 1/4-res
disparity, context/hidden states and matching features; the DEQ function
samples epipolar costs around the current depth, runs the ConvGRU update, and
applies Gauss-Newton pose refinements; a fixed-iteration solver replaces the
reference's (missing) anderson/broyden library, with phantom-gradient
backward. The final pose is the trajectory pose with the smallest update norm
(`depth_pose.py:539-544`), and inference can blend refined/initial disparity
via the epipolar consistency mask (`combine_via_mask`, `:611-666`).

Deviation (documented): the reference mutates `self.poses` as a side effect
inside the solver-mixed `deq_func`; here pose is part of the fixed-point
state and the solver is plain damped iteration (`f_thres` steps), which is
exactly the reference's semantics for the identity-mixing case.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from mal_tpu import geometry
from mal_tpu.config import Config
from mal_tpu.dualref.corr import build_pyramid, epipolar_cost, epipolar_cost_simple
from mal_tpu.dualref.hr_decoder import HRDepthDecoder
from mal_tpu.dualref.hrnet import HRNet
from mal_tpu.dualref.pose_update import direct_align
from mal_tpu.dualref.reprojections import Reprojections
from mal_tpu.dualref.update import SmallUpdateBlock, convex_upsample_disp
from mal_tpu.models.resnet import ResNetFeatures, imagenet_normalize
from mal_tpu.models.pose_decoder import PoseDecoder
from mal_tpu.ops.interp import resize_nearest

Array = jax.Array


class _ResidualBlockIN(nn.Module):
    """RAFT ResidualBlock with instance norm (`extractor.py:6-57`).

    torch `nn.InstanceNorm2d(planes)` defaults to affine=False, eps=1e-5 —
    no learnable norm parameters, so the state dict carries conv weights
    only (matters for `depth_pose.pth` conversion)."""
    filters: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        inorm = lambda name: nn.GroupNorm(num_groups=None, group_size=1,
                                          use_scale=False, use_bias=False,
                                          epsilon=1e-5, name=name)
        y = nn.Conv(self.filters, (3, 3), padding=((1, 1), (1, 1)), name="conv1")(x)
        y = nn.relu(inorm("norm1")(y))
        y = nn.Conv(self.filters, (3, 3), padding=((1, 1), (1, 1)), name="conv2")(y)
        y = nn.relu(inorm("norm2")(y))
        if x.shape[-1] != self.filters:
            x = nn.Conv(self.filters, (1, 1), name="proj")(x)
        return nn.relu(x + y)


class _ResidualBlockBN(nn.Module):
    """RAFT ResidualBlock with batch norm (`extractor.py`, norm_fn='batch' —
    the default for `PoseUpdate._make_layer`, `utils/utils.py:284-291`)."""
    filters: int

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5, name=name)
        y = nn.Conv(self.filters, (3, 3), padding=((1, 1), (1, 1)), name="conv1")(x)
        y = nn.relu(bn("norm1")(y))
        y = nn.Conv(self.filters, (3, 3), padding=((1, 1), (1, 1)), name="conv2")(y)
        y = nn.relu(bn("norm2")(y))
        return nn.relu(x + y)


class _FeatHead(nn.Module):
    """ResidualBlock + 3x3 conv head (conv2/context/hidden, `depth_pose.py:141-151`)."""
    out_dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = _ResidualBlockIN(x.shape[-1], name="res")(x)
        return nn.Conv(self.out_dim, (3, 3), padding=((1, 1), (1, 1)),
                       name="out")(y)


class _PoseWeights(nn.Module):
    """PoseUpdate's uncertainty head (`utils/utils.py:272-276`): two
    batch-norm ResidualBlocks + bias-free 1x1 conv + ReLU."""

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c = x.shape[-1]
        y = _ResidualBlockBN(c, name="blk1")(x, train=train)
        y = _ResidualBlockBN(c, name="blk2")(y, train=train)
        return nn.relu(nn.Conv(1, (1, 1), use_bias=False, name="out")(y))


class DEQState(NamedTuple):
    net: Array      # (B, h, w, hidden)
    depth: Array    # (B, h, w, 1)
    pose: Array     # (B, 4, 4)
    upd_norm: Array  # (B,) last pose-update norm


class DEQDepthPose(nn.Module):
    cfg: Config

    def setup(self):
        cfg = self.cfg
        # `depth_pose.py:44-45`: hdim = cdim = 64
        self.hidden_dim = 64
        self.context_dim = 64
        # bf16 conv trunks in the TPU fast mode (taps cast back to fp32 at
        # the call site — the DEQ solve / GN pose update stay fp32; mirrors
        # the manydepth fast mode, models/mal_model.py:42)
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        self.trunk = HRNet(base_width=18 if cfg.num_layers == 18 else cfg.num_layers,
                           dtype=dtype, name="cnet")
        self.decoder = HRDepthDecoder(name="decoder")
        self.conv2 = _FeatHead(64, name="conv2")
        self.context = _FeatHead(self.context_dim, name="context")
        self.hidden = _FeatHead(self.hidden_dim, name="hidden")
        self.update_block = SmallUpdateBlock(
            input_dim=self.context_dim, hidden_dim=self.hidden_dim,
            # --disable_wnorm drops the weight-norm reparameterization
            # (`depth_pose.py:66` _wnorm); --disable_evolving_pose_weight
            # drops the per-iteration pose-weight head (`update.py:136-141`)
            use_wnorm=not cfg.disable_wnorm,
            evolving_pose_weight=not cfg.disable_evolving_pose_weight,
            name="update_block")
        self.reproject = Reprojections(
            corr_radius=cfg.corr_radius, num_levels=cfg.corr_levels,
            gap_factor="depth", min_depth=cfg.min_depth,
            max_depth=cfg.max_depth, name="reproject_2")
        # 3 pose nets (one per camera side, `depth_pose.py:153-172`)
        self.pose_trunks = [ResNetFeatures(18, num_input_images=2,
                                           dtype=dtype,
                                           name=f"pose_trunk_{i}")
                            for i in range(3)]
        self.pose_heads = [PoseDecoder(num_frames_to_predict_for=1,
                                       name=f"pose_head_{i}") for i in range(3)]
        self.pose_weights = _PoseWeights(name="pose_weights")

    # ------------------------------------------------------------------
    def _initial_pose(self, image1: Array, image2: Array, invert: bool,
                      side: int, train: bool,
                      sides: Array | None = None) -> Array:
        """Per-side pose nets (`depth_pose.py:153-172,411-416`): the reference
        boolean-indexes the batch by camera side; with static shapes we run
        the needed nets and per-sample `where`-select when `sides` (B,) int
        is given, else the single static `side` net."""
        pair = [image2, image1] if invert else [image1, image2]
        x = jnp.concatenate(pair, axis=-1)

        def pose_for(s):
            feats = self.pose_trunks[s](x, train=train)
            aa, t = self.pose_heads[s](feats[-1].astype(jnp.float32))
            return geometry.transformation_from_parameters(
                aa[:, 0, 0], t[:, 0, 0], invert=invert)

        if self.is_initializing():
            # touch every side's net so checkpoint conversion finds all
            # 3 pose nets, not just the traced one
            for s in range(3):
                if s != side:
                    pose_for(s)
        if sides is None:
            return pose_for(side)
        poses = jnp.stack([pose_for(s) for s in range(3)], axis=1)  # (B,3,4,4)
        return jnp.take_along_axis(
            poses, sides[:, None, None, None].astype(jnp.int32), axis=1)[:, 0]

    def _depth_to_disp(self, depth: Array) -> Array:
        return geometry.depth_to_disp(depth, self.cfg.min_depth, self.cfg.max_depth)

    # ------------------------------------------------------------------
    def __call__(self, image1: Array, image2: Array, K_full: Array,
                 invert: bool = False, side: int = 0, train: bool = False,
                 sides: Array | None = None,
                 num_iters: int | None = None,
                 combine_via_mask: bool | None = None,
                 image3: Array | None = None):
        """Returns (outputs dict, poses [T0, T*]).

        outputs: {"disp_0_0", "disp_2_0"} initial + {"disp_0_k", "disp_2_k"}
        per supervised trajectory state (k>=1; eval has k=1 only).
        `image3` (the future frame, default frame_ids third entry) adds
        outputs["pose_p1"] — the pose-net-only forward the reference runs
        for f_i > 0 (`trainer.py:325-330` -> `depth_pose.forward_pose`,
        not inverted)."""
        cfg = self.cfg
        B, H, W, _ = image1.shape
        if num_iters is None:
            num_iters = cfg.deq_iters if train else int(
                cfg.deq_iters * cfg.deq_eval_factor)
        if combine_via_mask is None:
            combine_via_mask = not train

        im1 = imagenet_normalize(image1)
        im2 = imagenet_normalize(image2)

        # the stem runs on the CONCATENATED pair so train-mode BatchNorm
        # statistics pool both images like the reference
        # (`depth_pose.py:203-213`); stages/decoder run on image1's half
        taps = self.trunk(jnp.concatenate([im1, im2], axis=0), train=train,
                          stages_count=B)
        # fast mode runs the trunk in bf16; everything downstream (decoder,
        # epipolar sampling, GN pose update, DEQ solve) stays fp32
        taps = jax.tree.map(lambda a: a.astype(jnp.float32), taps)
        taps1 = {**taps, "stem1": taps["stem1"][:B],
                 "stem2": taps["stem2"][:B]}
        taps2 = {"stem1": taps["stem1"][B:], "stem2": taps["stem2"][B:]}

        disps, inter = self.decoder(taps1)
        x2b = inter["relu_x18"]

        fmap1 = self.conv2(taps1["stem2"])
        fmap2 = self.conv2(taps2["stem2"])
        inp = nn.relu(self.context(x2b))
        net0 = nn.tanh(self.hidden(x2b))

        f2_pyramid = build_pyramid(fmap2, cfg.corr_levels)

        K2 = geometry.scale_intrinsics(K_full, 2)

        # uncertainty weights for the GN pose update (`utils.py:291-298`);
        # ONE call on the 2B concat: the head has BatchNorm and the
        # reference splits after (`compute_uncertainty`, feats 2B).
        # --disable_fixed_pose_weight: all-ones weights, head unused
        # (`utils.py:296-298`)
        if cfg.disable_fixed_pose_weight:
            hw = taps["stem2"].shape[1:3]
            src_w = tgt_w = jnp.ones((B, *hw, 1), jnp.float32)
        else:
            w2b = self.pose_weights(taps["stem2"], train=train)
            src_w = 1.0 / (1.0 + w2b[:B])
            tgt_w = 1.0 / (1.0 + w2b[B:])

        pose0 = self._initial_pose(im1, im2, invert, side, train, sides=sides)

        disp_2_0 = disps[2]
        depth0 = geometry.disp_to_depth(disp_2_0, cfg.min_depth, cfg.max_depth)[1]

        outputs = {
            "disp_2_0": disp_2_0,
            "disp_0_0": convex_upsample_disp(
                disp_2_0, self.update_block.upsample_mask(net0)),
            "disp_1_0": disps[1], "disp_3_0": disps[3],
        }

        def deq_func(state: DEQState) -> DEQState:
            c, max_dx, _ = self.reproject.depth2epipolarcoords(
                state.pose, state.depth, K2)
            # --num_cost_volume_head splits the feature channels into H
            # per-head cost volumes (`depth_pose.py:435`, `corr.py`)
            corr = epipolar_cost(fmap1, f2_pyramid, c, cfg.corr_levels,
                                 num_head=cfg.num_cost_volume_head)
            net, delta = self.update_block(state.net, inp, corr, state.depth)
            new_depth = jnp.clip(state.depth + jnp.tanh(delta) * max_dx,
                                 cfg.min_depth, cfg.max_depth)

            # --disable_pose_updates freezes the pose at its pose-net value
            # (`depth_pose.py:450-455`: the GN refinement never runs)
            if cfg.disable_pose_updates:
                return DEQState(net, new_depth, state.pose,
                                jnp.zeros((B,)))
            weight = (None if cfg.disable_evolving_pose_weight
                      else self.update_block.pose_weight(net))

            pose, upd = state.pose, jnp.zeros((B, 6))
            for _ in range(cfg.num_pose_iter):
                c_p, P2 = self.reproject.depth2gradcoords(pose, new_depth, K2)
                pose, upd = direct_align(pose, K2, c_p, P2, fmap1, fmap2,
                                         src_w, tgt_w, weight,
                                         robust_pose_loss=cfg.robust_pose_loss)
            return DEQState(net, new_depth, pose,
                            jnp.linalg.norm(upd, axis=-1))

        # Fixed-point solve over the flattened (net, depth) subvector with the
        # pose as un-mixed auxiliary state — the reference's anderson solve of
        # `list2vec(net, depth)` with `self.poses` mutated per deq_func call
        # (`depth_pose.py:417-476,517-530`, `--f_solver anderson` default).
        # "iteration" is plain damped (Picard) iteration, unrolled: num_iters
        # is small and static, letting XLA pipeline the whole refinement.
        # The initial trajectory entry carries update-norm 1.0
        # (`depth_pose.py:425` seeds poses_updates_hist with ones).
        state = DEQState(net0, depth0, pose0, jnp.ones((B,)))
        poses_t = [pose0]
        upds_t = [jnp.ones((B,))]
        states_t: list[DEQState] = []  # post-eval states for --n_losses
        solve_state = jax.tree.map(lax.stop_gradient, state) if train else state

        h, w = net0.shape[1:3]
        nch = net0.shape[-1]

        def flatten(net, depth):
            return jnp.concatenate(
                [net.reshape(B, -1), depth.reshape(B, -1)], axis=1)

        def unflatten(z):
            n = z[:, :h * w * nch].reshape(B, h, w, nch)
            d = z[:, h * w * nch:].reshape(B, h, w, 1)
            return n, d

        def vec_f(z, aux):
            pose, _ = aux
            net, depth = unflatten(z)
            new = deq_func(DEQState(net, depth, pose, aux[1]))
            return (flatten(new.net, new.depth),
                    (new.pose, new.upd_norm))

        if cfg.deq_solver == "anderson":
            from mal_tpu.dualref.solvers import anderson_solver_aux

            res = anderson_solver_aux(
                vec_f, flatten(solve_state.net, solve_state.depth),
                (solve_state.pose, solve_state.upd_norm), steps=num_iters,
                stop_mode=cfg.deq_stop_mode)
            if train:
                res = jax.tree.map(lax.stop_gradient, res)
            anderson_res = res
            n_star, d_star = unflatten(res.result)
            solve_state = DEQState(n_star, d_star, res.aux[0], res.aux[1])
            poses_t += list(res.aux_trajectory[0])
            upds_t += list(res.aux_trajectory[1])
            for i in range(res.z_trajectory.shape[0]):
                zn, zd = unflatten(res.z_trajectory[i])
                states_t.append(DEQState(zn, zd, res.aux_trajectory[0][i],
                                         res.aux_trajectory[1][i]))
        else:
            anderson_res = None
            for _ in range(num_iters):
                solve_state = deq_func(solve_state)
                if train:
                    solve_state = jax.tree.map(lax.stop_gradient, solve_state)
                poses_t.append(solve_state.pose)
                upds_t.append(solve_state.upd_norm)
                states_t.append(solve_state)
        state_star = solve_state

        # pose with the minimum update norm over the trajectory — BOTH
        # branches (`depth_pose.py:540-545` train, `:604-609` eval)
        poses_t = jnp.stack(poses_t)  # (T, B, 4, 4)
        upds_t = jnp.stack(upds_t)    # (T, B)
        best = jnp.argmin(upds_t, axis=0)  # (B,)
        pose_star = jnp.take_along_axis(
            poses_t, best[None, :, None, None], axis=0)[0]

        if train:
            # Fixed-point correction (`--n_losses` / `--indexing`,
            # `depth_pose.py:491-500`): supervise the selected trajectory
            # states, each through a phantom-gradient unroll from its
            # detached value (n_losses=1 = the final state, the reference
            # default). `--indexing i j ...` taps explicit solver steps
            # (the reference appends f_thres as the final tap).
            if anderson_res is not None:
                # deq-lib tap semantics (`lib/solvers.anderson`, mirrored
                # at tests/ref_oracle/deq_lib.py:83-85): a tap at solver
                # step s yields the LOWEST-residual Anderson-mixed iterate
                # X_j with j <= s-3 (warmup evaluations are never
                # candidates); with the default indexing=[f_thres] the tap
                # IS the solver result.
                if cfg.deq_indexing:
                    steps_sel = sorted({int(i) for i in cfg.deq_indexing}
                                       | {num_iters})
                elif cfg.deq_n_losses > 1:
                    n_loss = min(num_iters, max(cfg.deq_n_losses, 1))
                    delta = num_iters // n_loss
                    steps_sel = [(kk + 1) * delta for kk in range(n_loss)]
                else:
                    steps_sel = [num_iters]
                fired = [t for t in steps_sel if 3 <= t <= num_iters]
                if not fired:  # deq-lib fallback: one tap, the final lowest
                    fired = [num_iters]
                trace = (anderson_res.abs_trace
                         if cfg.deq_stop_mode == "abs"
                         else anderson_res.rel_trace)
                sel_taps = []
                for t in fired:
                    if t - 2 <= 0 or trace.shape[0] == 0:
                        # deq-lib with threshold <= 2: the mixing loop never
                        # ran, the tap is the unmodified x0 (== res.result)
                        z_tap = anderson_res.result
                    else:
                        jj = jnp.argmin(trace[:t - 2])
                        z_tap = jnp.take(anderson_res.mixed_trajectory, jj,
                                         axis=0)
                    zn, zd = unflatten(z_tap)
                    sel_taps.append(DEQState(zn, zd, pose_star,
                                             state_star.upd_norm))
                sel = list(range(len(sel_taps)))
                states_for_tap = sel_taps
            else:
                n_avail = len(states_t)
                if cfg.deq_indexing:
                    sel = sorted({min(max(int(i), 1), n_avail) - 1
                                  for i in (*cfg.deq_indexing, n_avail)})
                else:
                    n_loss = max(cfg.deq_n_losses, 1)
                    delta = max(n_avail // n_loss, 1)
                    sel = sorted({min((k + 1) * delta, n_avail) - 1
                                  for k in range(n_loss)})
                states_for_tap = states_t
            final_states = []
            # the phantom deq_func calls CONTINUE the pose evolution from
            # the min-update-norm pose the train branch just installed
            # (`depth_pose.py:540-551`: self.poses := argmin pick, then
            # produce_grad's deq_func calls read and mutate self.poses);
            # the pose after the LAST phantom call is the returned T*
            phantom_pose = pose_star
            for pos, idx in enumerate(sel):
                z = jax.tree.map(lax.stop_gradient, states_for_tap[idx])
                z = DEQState(z.net, z.depth, phantom_pose, z.upd_norm)
                if cfg.deq_ift and pos == len(sel) - 1:
                    # `--ift`: the last tap's gradient comes from the
                    # implicit function theorem (`depth_pose.py:507-513`)
                    # instead of phantom unrolling
                    from mal_tpu.dualref.solvers import ift_output

                    aux_frozen = (z.pose, z.upd_norm)

                    def f_z(zz):
                        return vec_f(zz, aux_frozen)[0]

                    z_out = ift_output(f_z, flatten(z.net, z.depth),
                                       b_steps=cfg.deq_b_thres,
                                       safe=cfg.deq_safe_ift)
                    zn, zd = unflatten(z_out)
                    _, (pose_n, upd_n) = vec_f(flatten(z.net, z.depth),
                                               aux_frozen)
                    final_states.append(DEQState(zn, zd, pose_n, upd_n))
                    continue
                steps_out = []
                for _ in range(cfg.phantom_grad_steps):
                    # the phantom calls are the only deq_func invocations
                    # the backward traverses (the solver runs under
                    # stop_gradient) — rematerialize them so the epipolar
                    # sampling / GN / GRU intermediates are recomputed
                    # instead of stored (numerically exact; ~1 extra
                    # deq_func forward per tap). Measured round 5
                    # (benchmarks/bench_dualref_mem.py, AOT
                    # memory_analysis): with this checkpoint + bf16
                    # trunks the reference B=12 at 192x640 peaks at
                    # 15.27 GiB — it fits a 16 GB v5e (fp32: 15.86).
                    z_new = jax.checkpoint(deq_func)(z)
                    if cfg.deq_tau != 1.0:
                        # --tau damping on the fixed-point vector only
                        # (deq lib backward_factory: z <- (1-tau) z + tau
                        # f(z); the pose is module state, not damped)
                        t = cfg.deq_tau
                        z_new = DEQState(
                            (1 - t) * z.net + t * z_new.net,
                            (1 - t) * z.depth + t * z_new.depth,
                            z_new.pose, z_new.upd_norm)
                    z = z_new
                    steps_out.append(z)
                phantom_pose = z.pose
                # `--sup_all`: every phantom step is supervised, not only
                # the last (the DEQ lib's backward_factory(sup_all=True))
                final_states.extend(steps_out if cfg.deq_sup_all
                                    else steps_out[-1:])
            pose_star = phantom_pose
        else:
            final_states = [state_star]

        for k, st in enumerate(final_states, start=1):
            disp2 = self._depth_to_disp(st.depth)
            outputs[f"disp_2_{k}"] = disp2
            outputs[f"disp_0_{k}"] = convex_upsample_disp(
                disp2, self.update_block.upsample_mask(st.net))

        if combine_via_mask or train:
            # training always computes the mask for the consistency loss
            # (`depth_pose.py:553-593`); eval additionally blends with it.
            # TRAIN quirk: the reference's `_deq_forward` DISCARDS the
            # solver result (`_, trajectory, ... = self._fixed_point_solve`)
            # so the mask block's `vec2list(z_star)[1]` reads the INITIAL
            # depth, paired with the post-phantom pose; eval reassigns
            # z_star to the solved state first.
            mask_state = (DEQState(net0, depth0, pose_star,
                                   state_star.upd_norm)
                          if train else state_star)
            # --Pose_for_consistency_mask: which pose sweeps the epipolar
            # bins — "Tstar" (refined, default) or "T0" (pose-net initial)
            # (`depth_pose.py:553-556,614-617`)
            mask_pose = (pose_star if cfg.pose_for_consistency_mask == "Tstar"
                         else pose0)
            mask = self._consistency_mask(
                mask_state, mask_pose, fmap1, f2_pyramid, K2)
            outputs["consistency_mask"] = mask
        if combine_via_mask and not train:
            m = mask.astype(outputs["disp_2_1"].dtype)
            outputs["disp_2_1"] = (outputs["disp_2_1"] * m
                                   + outputs["disp_2_0"] * (1 - m))
            m0 = resize_nearest(m, H, W)
            outputs["disp_0_1"] = (outputs["disp_0_1"] * m0
                                   + outputs["disp_0_0"] * (1 - m0))

        if image3 is not None:
            # future-frame pose, pose-net only (`trainer.py:325-330`,
            # `depth_pose.forward_pose` — NOT inverted)
            im3 = imagenet_normalize(image3)
            outputs["pose_p1"] = self._initial_pose(
                im1, im3, invert=False, side=side, train=train, sides=sides)

        return outputs, [pose0, pose_star]

    # ------------------------------------------------------------------
    def _consistency_mask(self, state: DEQState, pose_star: Array,
                          fmap1: Array, f2_pyramid, K2: Array) -> Array:
        """Epipolar argmin-cost depth vs refined depth within 2x
        (`depth_pose.py:553-593`)."""
        cfg = self.cfg
        depth = state.depth
        c0, ds0 = self.reproject.depthbins2coords(pose_star, depth, K2)
        c0 = lax.stop_gradient(c0)
        ds0 = lax.stop_gradient(ds0)

        corr0 = epipolar_cost_simple(fmap1, f2_pyramid, c0, num_levels=1)
        # (B, h, w, D) -> argmin over D, gather the matching depth
        idx = jnp.argmin(corr0, axis=-1)  # (B, h, w)
        ds_hw = jnp.moveaxis(ds0[:, 0], 1, -1)  # (B, h, w, D)
        max_d = jnp.take_along_axis(ds_hw, idx[..., None], axis=-1)

        mask = ((max_d - depth) / depth) < 1.0
        mask &= ((depth - max_d) / max_d) < 1.0
        return lax.stop_gradient(mask)
