"""HRNet backbone in flax (NHWC) — topology-as-config (SURVEY.md §2.7, §3.3).

TPU-first redesign of the reference ``lib/models/pose_hrnet.py`` contract:

- NHWC layout throughout (TPU conv-native; the reference is NCHW).
- Params live in fp32; compute dtype is configurable (bf16 by default via
  ``Config.DTYPE``) so the convs hit the MXU at full rate while BatchNorm
  statistics stay fp32.
- Upsampling in the exchange/fusion units is nearest-neighbor via
  ``jnp.repeat`` (bit-exact for integer factors, fuses into the adjacent
  elementwise sum under XLA).
- The module graph is static Python built from the STAGE2/3/4 config dicts —
  same schema as the reference YAMLs, so W32/W48 are pure config.

Structure (reference §3.3): stem (two stride-2 3x3 convs -> 64ch) ->
layer1 (4 x Bottleneck -> 256ch) -> transition1 -> stage2 (parallel branches
{W, 2W}) -> transition2 -> stage3 {W, 2W, 4W} -> transition3 -> stage4
{W, 2W, 4W, 8W}, multi_scale_output=False (only the highest-res branch
leaves stage4) -> final 1x1 conv W -> K heatmaps.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from rsgnet_tpu.config.defaults import Config, StageConfig

BN_MOMENTUM = 0.9   # flax EMA momentum == 1 - torch momentum (0.1)


class _ConvKernel(nn.Module):
    """Holds a conv kernel param under the SAME tree path nn.Conv uses
    (<parent>/conv/kernel), so execution-strategy variants of a conv keep
    checkpoints, the torch converter, and exports byte-compatible."""
    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape)


def _space_to_depth_conv(x, kernel, dtype):
    """Odd-k/stride-2/SAME conv executed as space-to-depth(2) + a smaller
    stride-1 conv.

    The MXU loads input channels in 128-lane blocks, so a C_in=3 stem conv
    wastes ~98% of the systolic array's input dimension; packing 2x2 pixel
    blocks into channels (C_in=12) before the matmul recovers 4x of that.
    The k x k kernel is zero-padded to (k+1) x (k+1) (one row/col at the
    top/left — the taps that fall outside the 2x2 block lattice) and
    regrouped into a ((k+1)/2)^2 kernel over the block grid, so every
    output is the SAME sum of products: exact up to reduction-order
    rounding. Param tree is untouched (same (k,k,C,O) kernel); the
    rearrangement is traced into the program. Covers both stems in this
    repo: HRNet 3x3 (-> 2x2 on blocks) and pose_resnet 7x7 (-> 4x4).
    """
    b, h, w, c = x.shape
    k = kernel.shape[0]
    if h % 2 or w % 2:
        raise ValueError(f"s2d stem needs even input dims, got {h}x{w}")
    z = x.reshape(b, h // 2, 2, w // 2, 2, c)
    z = z.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    nblk = (k + 1) // 2
    kpad = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
    k2 = kpad.reshape(nblk, 2, nblk, 2, c, kernel.shape[-1])  # (bi,u,bj,v,c,o)
    k2 = k2.transpose(0, 2, 1, 3, 4, 5).reshape(nblk, nblk, 4 * c, -1)
    pad_lo = nblk // 2
    pad_hi = nblk - 1 - pad_lo
    return jax.lax.conv_general_dilated(
        z, k2.astype(dtype), window_strides=(1, 1),
        padding=((pad_lo, pad_hi), (pad_lo, pad_hi)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    dtype: Any = jnp.float32
    s2d: bool = False    # space-to-depth execution (3x3/stride-2 convs only)

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        if self.s2d:
            if self.kernel % 2 == 0 or self.stride != 2:
                raise ValueError("s2d execution requires an odd-kernel "
                                 "stride-2 conv")
            k = _ConvKernel((self.kernel, self.kernel, x.shape[-1],
                             self.features), name="conv")()
            x = _space_to_depth_conv(x, k, self.dtype)
        else:
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride),
                        padding=[(pad, pad), (pad, pad)], use_bias=False,
                        dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        if self.relu:
            x = nn.relu(x)
        return x


class BasicBlock(nn.Module):
    """conv3x3-bn-relu-conv3x3-bn + residual (expansion 1)."""
    features: int
    stride: int = 1
    dtype: Any = jnp.float32
    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = ConvBN(self.features, 3, self.stride, dtype=self.dtype,
                     name="cb1")(x, train)
        out = ConvBN(self.features, 3, 1, relu=False, dtype=self.dtype,
                     name="cb2")(out, train)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = ConvBN(self.features, 1, self.stride, relu=False,
                              dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """1x1 reduce -> 3x3 -> 1x1 expand(x4) + residual (expansion 4)."""
    features: int
    stride: int = 1
    dtype: Any = jnp.float32
    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.features * self.expansion
        residual = x
        out = ConvBN(self.features, 1, 1, dtype=self.dtype, name="cb1")(x, train)
        out = ConvBN(self.features, 3, self.stride, dtype=self.dtype,
                     name="cb2")(out, train)
        out = ConvBN(out_ch, 1, 1, relu=False, dtype=self.dtype,
                     name="cb3")(out, train)
        if residual.shape[-1] != out_ch or self.stride != 1:
            residual = ConvBN(out_ch, 1, self.stride, relu=False,
                              dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(out + residual)


BLOCKS = {"BASIC": BasicBlock, "BOTTLENECK": Bottleneck}


def _upsample_nearest(x, factor: int):
    x = jnp.repeat(x, factor, axis=1)
    return jnp.repeat(x, factor, axis=2)


class _BNState(nn.Module):
    """The SAME param/variable tree as ``nn.BatchNorm`` (scale/bias params,
    batch_stats mean/var) without executing normalization — the merged
    fusion path normalizes once over channel-concatenated edges, but each
    edge keeps its own checkpoint-compatible BN leaves. Called a second
    time with ``update=True`` to fold the merged batch statistics back into
    this edge's running stats (flax EMA rule, nn.BatchNorm:
    ra = momentum*ra + (1-momentum)*batch)."""
    features: int

    @nn.compact
    def __call__(self, batch_mean=None, batch_var=None, update=False):
        f = (self.features,)
        scale = self.param("scale", nn.initializers.ones, f, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, f, jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(f, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(f, jnp.float32))
        if update and not self.is_initializing():
            ra_mean.value = (BN_MOMENTUM * ra_mean.value
                             + (1 - BN_MOMENTUM) * batch_mean)
            ra_var.value = (BN_MOMENTUM * ra_var.value
                            + (1 - BN_MOMENTUM) * batch_var)
        return scale, bias, ra_mean.value, ra_var.value


class _EdgeParams(nn.Module):
    """Declares one fuse edge's ConvBN param tree (<name>/conv/kernel,
    <name>/bn/{scale,bias} + batch_stats mean/var) for merged execution."""
    features: int
    in_features: int
    kernel: int = 1

    @nn.compact
    def __call__(self, batch_mean=None, batch_var=None, update=False):
        kern = _ConvKernel((self.kernel, self.kernel, self.in_features,
                            self.features), name="conv")()
        scale, bias, ra_mean, ra_var = _BNState(self.features, name="bn")(
            batch_mean, batch_var, update)
        return kern, scale, bias, ra_mean, ra_var


def _block_diag_kernel(kernels):
    """(kh,kw,ci,co) kernels -> one block-diagonal (kh,kw,sum ci,sum co):
    conv(concat inputs, K) == concat of the per-kernel convs. The zero
    off-diagonal blocks contribute exact 0.0 products, so the outputs match
    the separate convs bit-for-bit; the point is ONE dispatch instead of N
    on a per-op-overhead-bound graph."""
    kh, kw = kernels[0].shape[:2]
    ci = sum(k.shape[2] for k in kernels)
    co = sum(k.shape[3] for k in kernels)
    out = jnp.zeros((kh, kw, ci, co), kernels[0].dtype)
    io = oo = 0
    for k in kernels:
        out = out.at[:, :, io:io + k.shape[2], oo:oo + k.shape[3]].set(k)
        io += k.shape[2]
        oo += k.shape[3]
    return out


class HighResolutionModule(nn.Module):
    """Parallel branches of blocks + exchange-fusion units (reference §3.3).

    Fusion: output branch i receives sum over input branches j of
      j == i: identity
      j >  i: 1x1 conv + BN, then nearest-upsample by 2^(j-i)
      j <  i: chain of stride-2 3x3 conv+BN (ReLU on all but the last),
    then ReLU on the sum.
    """
    num_branches: int
    block: str
    num_blocks: Sequence[int]
    num_channels: Sequence[int]     # raw config channels; blocks expand them
    multi_scale_output: bool = True
    dtype: Any = jnp.float32
    merged_fuse: bool = False       # MODEL.FUSE_MERGED execution strategy

    def _conv(self, x, kern, stride):
        # mirrors nn.Conv(dtype=self.dtype): both operands cast to the
        # compute dtype, SAME padding for the static kernel size
        pad = (kern.shape[0] - 1) // 2
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kern.astype(self.dtype),
            (stride, stride), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @staticmethod
    def _fused_bn(y, cols, train):
        """One BatchNorm over channel-concatenated edges; exact per-channel
        equivalence with per-edge nn.BatchNorm (same fp32 stats, same
        fast-variance E[x^2]-E[x]^2, same scale*rsqrt association)."""
        scale = jnp.concatenate([c[1] for c in cols])
        bias = jnp.concatenate([c[2] for c in cols])
        yf = y.astype(jnp.float32)
        if train:
            mean = jnp.mean(yf, (0, 1, 2))
            var = jnp.mean(jnp.square(yf), (0, 1, 2)) - jnp.square(mean)
            bm, bv = mean, var
        else:
            mean = jnp.concatenate([c[3] for c in cols])
            var = jnp.concatenate([c[4] for c in cols])
            bm = bv = None
        mul = scale * jax.lax.rsqrt(var + 1e-5)
        return (yf - mean) * mul + bias, bm, bv

    def _merged_fusion(self, outs, out_ch, num_out, train):
        """Exchange-fusion with merged dispatches (MODEL.FUSE_MERGED):

        - a source branch's 1x1 up-edges share their input, so they run as
          ONE channel-concat conv — a wider MXU matmul (e.g. stage4 branch3's
          three convs to {W,2W,4W} become one 8W->7W matmul);
        - its down-chains advance level-by-level: level 0 shares the source
          input (concat merge); deeper levels have per-chain inputs at the
          SAME resolution and merge block-diagonally;
        - each merged conv gets one fused BatchNorm over the concat
          channels; per-edge running stats are sliced back out.

        Same math as the unmerged loop up to reduction-order rounding;
        identical param tree (every edge keeps its ConvBN paths)."""
        acc = list(outs[:num_out])               # identity contributions

        def _apply(cols, edges, y, chans, train):
            y, bm, bv = self._fused_bn(y, cols, train)
            if train:
                off = 0
                for e, ch in zip(edges, chans):
                    e(bm[off:off + ch], bv[off:off + ch], update=True)
                    off += ch
            return y

        # up edges grouped by source j (targets i < j, i < num_out)
        for j in range(1, self.num_branches):
            targets = list(range(min(j, num_out)))
            if not targets:
                continue
            edges = [_EdgeParams(out_ch[i], out_ch[j], 1,
                                 name=f"fuse{i}_{j}") for i in targets]
            cols = [e() for e in edges]
            kern = jnp.concatenate([c[0] for c in cols], axis=-1)
            y = self._conv(outs[j], kern, 1)
            y = _apply(cols, edges, y, [out_ch[i] for i in targets], train)
            off = 0
            for i in targets:
                yi = y[..., off:off + out_ch[i]]
                off += out_ch[i]
                acc[i] = acc[i] + _upsample_nearest(yi, 2 ** (j - i))

        # down chains grouped by source j, advanced level-by-level
        for j in range(self.num_branches):
            targets = [i for i in range(j + 1, num_out)]
            if not targets:
                continue
            cur = {i: outs[j] for i in targets}
            for level in range(max(i - j for i in targets)):
                active = [i for i in targets if i - j > level]
                mods, chans = [], []
                for i in active:
                    last = level == i - j - 1
                    mods.append((i, last, _EdgeParams(
                        out_ch[i] if last else out_ch[j], out_ch[j], 3,
                        name=f"fuse{i}_{j}_down{level}")))
                    chans.append(out_ch[i] if last else out_ch[j])
                cols = [m[2]() for m in mods]
                if level == 0 or len(active) == 1:
                    # shared input (level 0) / single chain: concat kernels
                    kern = jnp.concatenate([c[0] for c in cols], axis=-1)
                    xin = cur[active[0]]
                else:
                    kern = _block_diag_kernel([c[0] for c in cols])
                    xin = jnp.concatenate([cur[i] for i in active], -1)
                y = self._conv(xin, kern, 2)
                y = _apply(cols, [m[2] for m in mods], y, chans, train)
                off = 0
                for (i, last, _), ch in zip(mods, chans):
                    yi = y[..., off:off + ch]
                    off += ch
                    if last:
                        acc[i] = acc[i] + yi         # relu only after the sum
                    else:
                        cur[i] = nn.relu(yi)
        return [nn.relu(a) for a in acc]

    @nn.compact
    def __call__(self, xs, train: bool = False):
        blk = BLOCKS[self.block]
        exp = blk.expansion
        out_ch = [c * exp for c in self.num_channels]   # reference num_inchannels
        outs = []
        for i in range(self.num_branches):
            x = xs[i]
            for b in range(self.num_blocks[i]):
                x = blk(self.num_channels[i], dtype=self.dtype,
                        name=f"branch{i}_block{b}")(x, train)
            outs.append(x)

        if self.num_branches == 1:
            return outs

        num_out = self.num_branches if self.multi_scale_output else 1
        if self.merged_fuse:
            return self._merged_fusion(outs, out_ch, num_out, train)
        fused = []
        for i in range(num_out):
            acc = None
            for j in range(self.num_branches):
                if j == i:
                    y = outs[j]
                elif j > i:
                    y = ConvBN(out_ch[i], 1, 1, relu=False,
                               dtype=self.dtype,
                               name=f"fuse{i}_{j}")(outs[j], train)
                    y = _upsample_nearest(y, 2 ** (j - i))
                else:  # j < i: downsample chain
                    y = outs[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = out_ch[i] if last else out_ch[j]
                        y = ConvBN(ch, 3, 2, relu=not last, dtype=self.dtype,
                                   name=f"fuse{i}_{j}_down{k}")(y, train)
                acc = y if acc is None else acc + y
            fused.append(nn.relu(acc))
        return fused


class PoseHighResolutionNet(nn.Module):
    """The full backbone + final heatmap head (reference `get_pose_net`)."""
    cfg: Config

    @property
    def dtype(self):
        return jnp.bfloat16 if self.cfg.DTYPE == "bfloat16" else jnp.float32

    def _stage(self, scfg: StageConfig, xs, train, name, multi_scale_output=True):
        mod_cls = HighResolutionModule
        if self.cfg.TRAIN.REMAT and train:
            # jax.checkpoint per module: recompute activations in the
            # backward pass instead of storing them (HBM for FLOPs)
            mod_cls = nn.remat(HighResolutionModule, static_argnums=(2,))
        for m in range(scfg.NUM_MODULES):
            mso = multi_scale_output or m < scfg.NUM_MODULES - 1
            xs = mod_cls(
                num_branches=scfg.NUM_BRANCHES, block=scfg.BLOCK,
                num_blocks=scfg.NUM_BLOCKS, num_channels=scfg.NUM_CHANNELS,
                multi_scale_output=mso, dtype=self.dtype,
                merged_fuse=self.cfg.MODEL.FUSE_MERGED,
                name=f"{name}_module{m}")(xs, train)
        return xs

    def _transition(self, prev_channels, new_channels, xs, train, name):
        outs = []
        for i, ch in enumerate(new_channels):
            if i < len(prev_channels):
                if prev_channels[i] != ch:
                    outs.append(ConvBN(ch, 3, 1, dtype=self.dtype,
                                       name=f"{name}_{i}")(xs[i], train))
                else:
                    outs.append(xs[i])
            else:
                # new (coarser) branch from the last existing one; only the
                # final conv of the chain maps to the target channel count
                # (reference transition-layer construction)
                y = xs[-1]
                steps = i + 1 - len(prev_channels)
                for k in range(steps):
                    out_ch = ch if k == steps - 1 else prev_channels[-1]
                    y = ConvBN(out_ch, 3, 2, dtype=self.dtype,
                               name=f"{name}_{i}_down{k}")(y, train)
                outs.append(y)
        return outs

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        cfg = self.cfg
        extra = cfg.MODEL.EXTRA
        x = x.astype(self.dtype)

        # stem — stem1 optionally executes as space-to-depth (C_in=3 is
        # MXU-hostile; MODEL.S2D_STEM re-expresses it exactly, see
        # _space_to_depth_conv); stem2 has C_in=64 and stays a plain conv
        x = ConvBN(64, 3, 2, dtype=self.dtype, s2d=cfg.MODEL.S2D_STEM,
                   name="stem1")(x, train)
        x = ConvBN(64, 3, 2, dtype=self.dtype, name="stem2")(x, train)
        # layer1: 4 x Bottleneck(64) -> 256ch
        for b in range(4):
            x = Bottleneck(64, dtype=self.dtype, name=f"layer1_{b}")(x, train)

        s2 = extra.STAGE2
        c2 = [c * BLOCKS[s2.BLOCK].expansion for c in s2.NUM_CHANNELS]
        xs = self._transition([256], c2, [x], train, "transition1")
        xs = self._stage(s2, xs, train, "stage2")

        s3 = extra.STAGE3
        c3 = [c * BLOCKS[s3.BLOCK].expansion for c in s3.NUM_CHANNELS]
        xs = self._transition(c2, c3, xs, train, "transition2")
        xs = self._stage(s3, xs, train, "stage3")

        s4 = extra.STAGE4
        c4 = [c * BLOCKS[s4.BLOCK].expansion for c in s4.NUM_CHANNELS]
        xs = self._transition(c3, c4, xs, train, "transition3")
        xs = self._stage(s4, xs, train, "stage4", multi_scale_output=False)

        feats = xs[0].astype(jnp.float32)
        k = extra.FINAL_CONV_KERNEL
        pad = 1 if k == 3 else 0
        heatmaps = nn.Conv(cfg.MODEL.NUM_JOINTS, (k, k),
                           padding=[(pad, pad), (pad, pad)],
                           dtype=jnp.float32, name="final_layer")(feats)
        if return_features:
            return heatmaps, feats
        return heatmaps
