"""Sparse convolution compute + normalization modules.

Feature-side compute for the sparse engine (coordinate side lives in
``kernel_map.py``). Replaces ``ME.MinkowskiConvolution`` /
``MinkowskiConvolutionTranspose`` / ``MinkowskiBatchNorm`` / ``MinkowskiReLU``
as used by ``situation3d/models/mink_unet.py`` and ``resnet_base.py``.

TPU mapping: a sparse conv is a sum over kernel offsets of
``gather -> matmul``. Offsets are processed in chunks so the contraction
dimension presented to the MXU is ``chunk * C_in >= ~256`` instead of a
skinny ``C_in``; accumulation happens in float32 regardless of the
(bfloat16) activation dtype.
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from situation3d_tpu.sparse.tensor import SparseVoxels


def sparse_conv_apply(
    feats: jnp.ndarray,
    nbr_idx: jnp.ndarray,
    kernel: jnp.ndarray,
    offset_chunk: Optional[int] = None,
    precision=None,
    pallas_gather: Any = False,
    symmetric_bwd: bool = False,
    transpose_map: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Gather-matmul sparse convolution.

    Args:
      feats:   [B, V_in, C_in] input features (padding rows must be zero).
      nbr_idx: int32 [B, V_out, K] neighbor map (miss == V_in gathers zeros).
      kernel:  [K, C_in, C_out] weights.
      offset_chunk: offsets per fused matmul; default targets a >=256-wide
        contraction for the MXU.
      pallas_gather: serve the gathers from a VMEM-resident Pallas kernel
        when the table fits (ops/pallas/gather.py); XLA otherwise.
      symmetric_bwd: gather-only backward for SAME-COORDS odd-cube-kernel
        convs (all the UNet's k3/k5 stride-1 convs). Requires
        ``out coords == in coords`` and a centered odd kernel, where the
        map's transpose is itself under offset reversal
        (``nbr(v,k)=u  <=>  nbr(u,K-1-k)=v``): both dx and dW then come
        from ONE loop of K dy-gathers — no scatter-adds (the autodiff
        backward's dx is K scatter-adds, the measured-slow engine class;
        the fused path's custom VJP additionally re-gathers feats K
        times). See DESIGN.md §16.
      transpose_map: explicit transpose map [B, V_in, K] for STRIDED
        convs (k2 down convs pass the level's ``map_up``, transpose k2
        up convs pass ``map_down``) — same gather-only backward, no
        kernel-index flip. Mutually exclusive with ``symmetric_bwd``.

    Returns [B, V_out, C_out] (float32 accumulated, cast back to feats.dtype).
    """
    if transpose_map is not None:
        return _sparse_conv_tmap(feats, nbr_idx, transpose_map, kernel,
                                 offset_chunk, precision, pallas_gather,
                                 False)
    if symmetric_bwd:
        return _sparse_conv_tmap(feats, nbr_idx, nbr_idx, kernel,
                                 offset_chunk, precision, pallas_gather,
                                 True)
    return _sparse_conv_impl(feats, nbr_idx, kernel, offset_chunk,
                             precision, pallas_gather)


def _sparse_conv_impl(feats, nbr_idx, kernel, offset_chunk, precision,
                      pallas_gather):
    # "+flat" suffix on the routing value: the XLA per-offset branch
    # gathers rows FLAT (unbatched t[i] from the [B*(V+1), C] table)
    # instead of batched take_along_axis — the same access-path switch
    # that won conv0 13% in situ (DESIGN.md §15); probe facts say flat
    # beats batched on this engine's row gathers (CLAUDE.md r5).
    flat_rows = isinstance(pallas_gather, str) \
        and pallas_gather.endswith("+flat")
    if flat_rows:
        pallas_gather = pallas_gather[:-5]
    B, V_in, C_in = feats.shape
    K = kernel.shape[0]
    V_out = nbr_idx.shape[1]
    if offset_chunk is None:
        # measured on v5e: per-offset (chunk=1) avoids the cross-lane
        # relayout of merging K into the channel dim and wins whenever the
        # op is gather-bound (all our conv shapes); the MXU under-utilization
        # at small C_in is irrelevant there
        offset_chunk = 1

    # "fused"/"fused_force": gather + mask + matmul as ONE Pallas kernel
    # with the (packed) table VMEM-resident — the K*V*C gathered windows
    # never touch HBM (ops/pallas/fused_conv.py). Auto mode runs on TPU
    # only; "fused_force" uses interpret mode on CPU (tests).
    if isinstance(pallas_gather, str) and pallas_gather.startswith("fused"):
        on_cpu = jax.devices()[0].platform == "cpu"
        force = pallas_gather == "fused_force"
        if force or not on_cpu:
            from situation3d_tpu.ops.pallas.fused_conv import (
                fused_conv_fits, fused_conv_wins, fused_sparse_conv)
            if fused_conv_fits(V_in, C_in, kernel.shape[-1]) and (
                    force or fused_conv_wins(V_in, C_in, V_out, K,
                                             flat_baseline=flat_rows)):
                out = fused_sparse_conv(feats, nbr_idx, kernel, 256,
                                        on_cpu)
                return out.astype(feats.dtype)
        # table doesn't fit (or CPU auto): plain pallas-gather auto path
        pallas_gather = True

    padded = jnp.concatenate([feats, jnp.zeros((B, 1, C_in), feats.dtype)], axis=1)

    # pallas_gather: False | True (auto: skipped on the CPU backend, where
    # only slow interpret mode exists) | "force" (tests)
    use_pallas = bool(pallas_gather)
    if pallas_gather is True:
        use_pallas = jax.devices()[0].platform != "cpu"
    if use_pallas:
        from situation3d_tpu.ops.pallas.gather import (gather_fits_vmem,
                                                       vmem_gather_rows)
        # measured v5e (B=8, K=27): 1.66x at (V=12288, C=64), 1.50x at
        # (V=6144, C=128), 0.93x at (V=3072, C=256) — the unrolled
        # dynamic-sublane loads stop paying once rows span >1 lane tile,
        # so only C <= 128 routes through the kernel
        if C_in <= 128 and gather_fits_vmem(V_in + 1, C_in):
            # one kernel call serves all K offsets from the VMEM-resident
            # table; offset-major index order keeps per-offset slices
            # contiguous (no relayout before the matmuls)
            blk = 256
            idx_t = nbr_idx.transpose(0, 2, 1).reshape(B, K * V_out)
            pad = (-idx_t.shape[1]) % blk
            if pad:
                idx_t = jnp.pad(idx_t, ((0, 0), (0, pad)),
                                constant_values=V_in)
            g_all = vmem_gather_rows(padded.astype(jnp.float32), idx_t, blk)
            g_all = g_all[:, : K * V_out].reshape(B, K, V_out, C_in)
            out = jnp.zeros((B, V_out, kernel.shape[-1]), jnp.float32)
            for k in range(K):
                out = out + jnp.einsum(
                    "bvc,cd->bvd", g_all[:, k].astype(feats.dtype),
                    kernel[k].astype(feats.dtype),
                    preferred_element_type=jnp.float32, precision=precision)
            return out.astype(feats.dtype)

    flat_tab = padded.reshape(B * (V_in + 1), C_in) if flat_rows else None
    row_base = (jnp.arange(B, dtype=jnp.int32) * (V_in + 1))[:, None] \
        if flat_rows else None
    out = jnp.zeros((B, V_out, kernel.shape[-1]), jnp.float32)
    for start in range(0, K, offset_chunk):
        stop = min(start + offset_chunk, K)
        nk = stop - start
        idx = nbr_idx[:, :, start:stop].reshape(B, V_out * nk)
        if flat_rows:
            # negatives -> the zero pad row (take_along_axis wraps -1
            # there; the fused path zeroes all negatives — this matches
            # both on the documented conventions)
            idxf = jnp.where(idx < 0, V_in, jnp.minimum(idx, V_in)) \
                + row_base
            g = flat_tab[idxf.reshape(-1)]
        else:
            g = jnp.take_along_axis(padded, idx[..., None], axis=1)
        g = g.reshape(B, V_out, nk * C_in)
        w = kernel[start:stop].reshape(nk * C_in, -1).astype(feats.dtype)
        out = out + jnp.einsum(
            "bvc,cd->bvd", g, w, preferred_element_type=jnp.float32,
            precision=precision,
        )
    return out.astype(feats.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _sparse_conv_tmap(feats, nbr_idx, t_map, kernel, offset_chunk,
                      precision, pallas_gather, flip_kernel):
    """``sparse_conv_apply`` with the gather-only (transpose-map)
    backward. ``t_map`` [B, V_in, K] is the TRANSPOSE of ``nbr_idx``:
    ``t_map(u, j) = v  <=>  nbr_idx(v, g(j)) = u`` with ``g(j) = K-1-j``
    when ``flip_kernel`` (same-coords centered odd kernels, where the map
    is its own transpose under offset reversal and ``t_map is nbr_idx``)
    and ``g(j) = j`` otherwise (the UNet's k2 pairs: ``map_down`` and
    ``map_up`` are built from +k2 / -k2 offsets, so each is the other's
    transpose at the SAME column index — minkunet.build_unet_plan)."""
    return _sparse_conv_impl(feats, nbr_idx, kernel, offset_chunk,
                             precision, pallas_gather)


def _tmap_fwd(feats, nbr_idx, t_map, kernel, offset_chunk, precision,
              pallas_gather, flip_kernel):
    out = _sparse_conv_impl(feats, nbr_idx, kernel, offset_chunk,
                            precision, pallas_gather)
    return out, (feats, t_map, kernel)


def _tmap_bwd(offset_chunk, precision, pallas_gather, flip_kernel, res, dy):
    """Shared-gather backward (DESIGN.md §16). With ``nbr(v, g(j)) = u
    <=> t_map(u, j) = v`` (both directions exist because maps index only
    real voxels; parity/extent misses are misses in both maps):

      dx[u]    = sum_j gather(dy, t_map[:, j])[u] @ W[g(j)]^T
      dW[g(j)] = sum_u feats[u]^T gather(dy, t_map[:, j])[u]

    One loop of K dy-gathers serves BOTH — zero scatter-adds (autodiff dx
    is K scatter-adds, measured 2-10x the forward's gather class:
    scripts/mb_train_bwd.py) and zero feats re-gathers (the fused path's
    VJP pays K of them for dW). Misses gather the zero pad row; padding
    voxels have all-miss t_map rows, so their dy never enters and their
    dx is zero; feats padding rows are zero by the engine contract, so dW
    is unpolluted. Deterministic (pure gathers + matmuls).
    """
    feats, t_map, kernel = res
    B, V_in, C_in = feats.shape
    K, _, C_out = kernel.shape
    V_out = dy.shape[1]
    dyc = dy.astype(feats.dtype)
    dy_p = jnp.concatenate(
        [dyc, jnp.zeros((B, 1, C_out), dyc.dtype)], axis=1)
    idx_safe = jnp.where((t_map >= 0) & (t_map < V_out), t_map, V_out)
    flat_rows = isinstance(pallas_gather, str) \
        and pallas_gather.endswith("+flat")
    dy_flat = dy_p.reshape(B * (V_out + 1), C_out) if flat_rows else None
    row_base = (jnp.arange(B, dtype=jnp.int32) * (V_out + 1))[:, None] \
        if flat_rows else None
    dx = jnp.zeros((B, V_in, C_in), jnp.float32)
    dW = [None] * K
    for j in range(K):
        kk = K - 1 - j if flip_kernel else j
        if flat_rows:
            g = dy_flat[(idx_safe[:, :, j] + row_base).reshape(-1)] \
                .reshape(B, V_in, C_out)
        else:
            g = jnp.take_along_axis(dy_p, idx_safe[:, :, j, None], axis=1)
        dx = dx + jnp.einsum(
            "bvd,cd->bvc", g, kernel[kk].astype(g.dtype),
            preferred_element_type=jnp.float32, precision=precision)
        dW[kk] = jnp.einsum(
            "bvc,bvd->cd", feats, g,
            preferred_element_type=jnp.float32, precision=precision)
    return (dx.astype(feats.dtype), None, None,
            jnp.stack(dW).astype(kernel.dtype))


_sparse_conv_tmap.defvjp(_tmap_fwd, _tmap_bwd)


class SparseConv(nn.Module):
    """Sparse convolution over a precomputed neighbor map.

    ``ME.MinkowskiConvolution(in, out, kernel_size, stride, dimension=3)``
    equivalent (bias-free, like the reference's convs — BN supplies bias).
    The same module implements transpose convs: the direction lives entirely
    in the neighbor map.
    """
    out_channels: int
    kernel_volume: int  # K = kernel_size**3 (or product of per-axis sizes)
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    # dense-grid path for same-stride k3 convs at coarse strides (see
    # sparse_conv_dense_grid); requires out coords == in coords
    dense_grid_extent: Optional[tuple] = None
    pallas_gather: Any = False
    # map-free z-window path for same-stride k3 convs at C_in == 32 (see
    # sparse_conv_k3_zwin); requires out coords == in coords
    zwin_extent: Optional[tuple] = None
    # gather-only backward (valid for same-coords odd-cube kernels only;
    # see sparse_conv_apply symmetric_bwd)
    symmetric_bwd: bool = False

    @nn.compact
    def __call__(self, x: SparseVoxels, nbr_idx, out_coords, out_mask,
                 out_stride, transpose_map=None) -> SparseVoxels:
        c_in = x.num_channels
        # fan-in init like ME's kaiming for sparse kernels
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal"),
            (self.kernel_volume, c_in, self.out_channels),
            jnp.float32,
        )
        if (self.zwin_extent is not None and self.kernel_volume == 27
                and c_in == 32):
            out = sparse_conv_k3_zwin(
                x.feats.astype(self.dtype), x.coords, x.mask,
                kernel.astype(self.dtype), tuple(self.zwin_extent), x.stride)
        elif self.dense_grid_extent is not None and self.kernel_volume == 27:
            out = sparse_conv_dense_grid(
                x.feats.astype(self.dtype), x.coords, x.mask, x.stride,
                kernel, self.dense_grid_extent)
        else:
            out = sparse_conv_apply(x.feats.astype(self.dtype), nbr_idx, kernel,
                                    pallas_gather=self.pallas_gather,
                                    symmetric_bwd=self.symmetric_bwd,
                                    transpose_map=transpose_map)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
            out = out + bias.astype(out.dtype)
        out = jnp.where(out_mask[..., None], out, 0)
        return SparseVoxels(coords=out_coords, feats=out, mask=out_mask, stride=out_stride)


class SparseConvZWin(nn.Module):
    """The k5 stride-1 conv0 as a map-free z-window dense-grid conv (see
    :func:`sparse_conv0_zwin`). Parameter tree identical to
    ``SparseConv`` (one [125, C_in, C_out] kernel) so checkpoints are
    interchangeable with the gather-map path."""
    out_channels: int
    extent: tuple
    dtype: jnp.dtype = jnp.float32
    int8_grid: bool = False
    flat_gather: bool = False
    unique_scatter: bool = False
    flat_scatter: bool = False

    @nn.compact
    def __call__(self, x: SparseVoxels) -> SparseVoxels:
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal"),
            (125, x.num_channels, self.out_channels), jnp.float32)
        # kernel passed f32: the int8 path folds the quantization affine
        # into it BEFORE the bf16 cast (single rounding); the plain path
        # casts inside identically either way
        out, _ = sparse_conv0_zwin(
            x.feats.astype(self.dtype), x.coords, x.mask,
            kernel, tuple(self.extent),
            int8_grid=self.int8_grid,
            flat_gather=self.flat_gather,
            unique_scatter=self.unique_scatter,
            flat_scatter=self.flat_scatter)
        return SparseVoxels(coords=x.coords, feats=out, mask=x.mask,
                            stride=x.stride)


class SparseConv1x1(nn.Module):
    """kernel_size=1 sparse conv == per-voxel dense projection (``final`` layer
    and BasicBlock downsample path in the reference)."""
    out_channels: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: SparseVoxels) -> SparseVoxels:
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal"),
            (x.num_channels, self.out_channels),
            jnp.float32,
        )
        out = jnp.einsum(
            "bvc,cd->bvd", x.feats.astype(self.dtype), w.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
            out = out + b
        out = jnp.where(x.mask[..., None], out, 0).astype(self.dtype)
        return x.replace(feats=out)


class SparseBatchNorm(nn.Module):
    """Masked batch norm over valid voxels (``ME.MinkowskiBatchNorm``).

    Statistics are computed over all valid voxels of the whole batch in
    float32. In training mode, running stats update into the
    ``batch_stats`` collection; in eval (the frozen-OpenScene path of SIG3D
    training, ``CONF.TRAIN.no_update_filter``) running stats are used.
    ``momentum`` is overridable per-call for the BN-momentum schedule
    (``lib/solver.py:249-257``).
    """
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: SparseVoxels, use_running_average: bool = False,
                 momentum: Optional[float] = None) -> SparseVoxels:
        c = x.num_channels
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            f = x.feats.astype(jnp.float32)
            m = x.mask[..., None].astype(jnp.float32)
            n = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(f * m, axis=(0, 1)) / n
            var = jnp.sum(jnp.square(f - mean) * m, axis=(0, 1)) / n
            mom = self.momentum if momentum is None else momentum
            if not self.is_initializing():
                ra_mean.value = mom * ra_mean.value + (1 - mom) * mean
                ra_var.value = mom * ra_var.value + (1 - mom) * var

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        out = (x.feats.astype(jnp.float32) - mean) * inv + bias
        out = jnp.where(x.mask[..., None], out, 0).astype(self.dtype)
        return x.replace(feats=out)


def sparse_relu(x: SparseVoxels) -> SparseVoxels:
    return x.replace(feats=jnp.maximum(x.feats, 0))


def global_avg_pool(x: SparseVoxels) -> jnp.ndarray:
    """``ME.MinkowskiGlobalPooling`` equivalent: [B, C] masked mean."""
    m = x.mask[..., None].astype(jnp.float32)
    s = jnp.sum(x.feats.astype(jnp.float32) * m, axis=1)
    n = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    return s / n


@functools.lru_cache(maxsize=1)
def _zwin_phase_maps():
    """Static (phase, window-position, kernel-tap) index triplets for the
    z-window conv0 phase-expanded weight scatter.

    For a voxel whose padded coords have phase ``py = (y+PAD-2)&3``,
    ``pz = (z+PAD-2)&7`` (== y&3, z&7 at PAD=2), kernel tap
    ``(dx, j, k, ch)`` (y offset j-2, z offset k-2) lives in the gathered
    ``[20, 128]`` window block at flat position
    ``m = ((dx*2+cc)*2+gg)*128 + (ys*8+s)*4 + ch`` with
    ``gg, ys = (py+j) >> 2, (py+j) & 3`` and ``cc, s = (pz+k) >> 3,
    (pz+k) & 7`` — matching the scatter's ``(4 y-cells x 8 z-slots x 4 ch)``
    lane packing and the window row order ``(dx, z-chunk, y-group)``.
    Kernel taps are indexed into the ``[125*4, C_out]`` flattened kernel in
    kernel_offsets(5) order (x slowest): ``t = ((dx*5+j)*5+k)*4 + ch``.
    """
    py, pz, dx, j, k, ch = np.meshgrid(
        np.arange(4), np.arange(8), np.arange(5), np.arange(5), np.arange(5),
        np.arange(4), indexing="ij")
    w = py + j
    u = pz + k
    p_idx = (py * 8 + pz).ravel()
    m_idx = (((dx * 2 + (u >> 3)) * 2 + (w >> 2)) * 128
             + ((w & 3) * 8 + (u & 7)) * 4 + ch).ravel()
    t_idx = (((dx * 5 + j) * 5 + k) * 4 + ch).ravel()
    return (np.asarray(p_idx, np.int32), np.asarray(m_idx, np.int32),
            np.asarray(t_idx, np.int32))


def sparse_conv0_zwin(
    feats: jnp.ndarray,
    coords: jnp.ndarray,
    mask: jnp.ndarray,
    kernel: jnp.ndarray,
    extent,
    precision=None,
    batch_chunk: int = 2,
    int8_grid: bool = False,
    _int8_flat_gather: bool = True,
    _int8_unique_scatter: bool = True,
    flat_gather: bool = False,
    unique_scatter: bool = False,
    flat_scatter: bool = False,
):
    """k5 stride-1 sparse conv via a window-packed dense FEATURE grid — no
    kernel map at all.

    The level-0 k5 conv (``conv0p1s1``, ``mink_unet.py`` MinkUNet18A) is
    the single most expensive coordinate consumer in the network: its
    kernel map alone is ``V*125`` single-int32 grid gathers (~6.1 M rows =
    79% of the per-sample map budget at the measured ~65 M rows/s), plus
    ``V*125`` feature-row gathers. This formulation removes both:

    1. scatter the C_in=3 features (zero-padded to 4 lanes) into a dense
       grid whose 128-lane rows pack ``4 y-cells x 8 z-slots x 4 ch`` —
       exactly one TPU lane tile, so there is NO layout padding (a
       naive [..., 4]-minor grid lane-pads 32x and OOMs at compile);
    2. per output voxel, gather the 2x2 (y-group, z-chunk) window rows for
       each of the 5 dx offsets — 20 contiguous 256 B rows/voxel instead
       of 125 single int32s + 125 feature rows (bytes-bound at the
       measured 13-18 GB/s: ~5 KB/voxel vs the map path's ~95 ms/sample
       of serial single-element gathers);
    3. contract the whole [V, 20*128] window block with a PHASE-EXPANDED
       weight matrix [2560, 32*C_out]: a voxel's taps sit at window/lane
       positions determined solely by its (y&3, z&7) phase, so the kernel
       is pre-scattered into 32 per-phase column blocks (16k-row static
       scatter of the [125, C_in, C_out] kernel) and the tap extraction +
       conv become ONE 2560-deep MXU matmul;
    4. select each voxel's phase block with a one-hot einsum over the 32
       phases (exactly one nonzero term — selection-exact).

    Tap extraction via intermediate one-hot einsums instead (the first
    formulation) compiles to dot outputs with 4-/5-wide minor dims that
    Mosaic lane-pads 32x (a 36 GB allocation at the SQA3D extent); the
    phase-matmul keeps every big intermediate at a 128-multiple minor.

    The batch is processed in ``lax.map`` chunks of ``batch_chunk`` so the
    transient grid (~0.6 GB/sample at extent 512x512x256) never exceeds
    ~1.2 GB regardless of batch size.

    Numerically identical to the gather-map path up to f32 summation order
    for all in-extent voxels (misses read zeros). Sole semantic difference:
    out-of-extent voxels output ZERO here, where the map path still gives
    them their partial in-extent neighborhoods — both count them in
    ``extent_misses`` (an already-reported degraded case; scenes are meant
    to fit the grid).

    Args:
      feats: [B, V, 3] (padding rows zero); coords int32 [B, V, 3] stride-1
      voxels; mask bool [B, V]; kernel [125, 3, C_out] in kernel_offsets(5)
      order (x slowest); extent static (X, Y, Z).
      int8_grid: round-5 bandwidth lever (DESIGN.md §14). The grid stores
        int8 instead of ``feats.dtype``: per-channel min/max affine
        quantization of the input features, the occupancy flag in the
        4th (pad) channel lane, and the affine fold into the
        phase-expanded weights (the conv is linear, so
        ``f = lo + step*(q+128)`` folds exactly: channel weights scale by
        ``step``, the occupancy weight absorbs ``sum_c (lo_c +
        128*step_c) W[:,c,:]``). Window rows shrink 256 B -> 128 B (the
        measured 128 B int8 row gather runs 3.7x the 256 B bf16 rate on
        v5e — scripts/mb_int8_gather.py), and the scatter writes ONE
        packed int32 per voxel instead of 3 scalars. Quantization error
        <= step/2 (0.2% of the per-channel range) — the same order as
        the bf16 rounding the production path already applies to its
        inputs; EXACT for full-range byte-valued colors (the reference's
        actual conv0 input, ``lib/sepdataset.py`` RGB features).
      flat_gather: gather the window rows from the grid reshaped flat
        ``[bc*n_rows, 128]`` with unbatched ``t[i]`` indexing instead of
        batched ``take_along_axis`` — chip probe #4
        (scripts/mb_conv0_probe4.py): 12.6 vs 14.9 ms/sample on the bf16
        grid (the int8 variant of this lost in situ to the bitcast
        layout, DESIGN.md §14; the bf16 grid is natively laid out).
      unique_scatter: pass ``unique_indices=True`` on the bf16 grid
        scatter — true by construction (voxels are dedup'd, one (row,
        lane) slot per (voxel, channel)); measured 10-15% on scatters
        elsewhere (CLAUDE.md).
      flat_scatter: build the grid with a flat 2-D scatter into
        ``[bc*n_rows, 128]`` instead of the batched 3-D form — probe #6
        (scripts/mb_conv0_probe6.py): 15.5 vs 18.1 ms/sample on the real
        conv0 rows; bit-exact (drop semantics preserved via an
        out-of-bounds flat row for invalid voxels).
    Returns ([B, V, C_out], extent_misses int32 [B]).
    """
    B, V, C_in = feats.shape
    C_out = kernel.shape[-1]
    X, Y, Z = extent
    PAD = 2                      # k5 reach
    CH = 4                       # C_in padded to a 4-lane slot
    XP = X + 2 * PAD
    # windows read group/chunk g0..g0+1 / c0..c0+1; sizes cover any Y, Z
    NYG = (Y + 1) // 4 + 2       # y-groups of 4 (y' = y + PAD)
    ZC = (Z - 1) // 8 + 2        # z-chunks of 8

    in_extent = mask & jnp.all(coords >= 0, axis=-1) \
        & (coords[..., 0] < X) & (coords[..., 1] < Y) & (coords[..., 2] < Z)
    misses = jnp.sum((mask & ~in_extent).astype(jnp.int32), axis=1)

    n_rows = XP * ZC * NYG
    dxs = np.arange(-PAD, PAD + 1, dtype=np.int32)               # [5]

    # phase-expanded weight: WPmat[m, p*C_out+o] holds kernel tap
    # (dx, j, k, ch) at the window/lane position m where a voxel of phase
    # p = (py, pz) finds that tap in its gathered [20, 128] window block
    p_idx, m_idx, t_idx = _zwin_phase_maps()
    if int8_grid:
        assert C_in < CH, "int8 grid needs the pad lane for occupancy"
        # per-batch per-channel affine over in-extent voxels (computed
        # once, shared by every lax.map chunk)
        f32a = feats.astype(jnp.float32)
        extm = in_extent[..., None]
        big = jnp.float32(3e37)
        any_valid = jnp.any(in_extent)
        lo = jnp.min(jnp.where(extm, f32a, big), axis=(0, 1))[:C_in]
        hi = jnp.max(jnp.where(extm, f32a, -big), axis=(0, 1))[:C_in]
        lo = jnp.where(any_valid, lo, 0.0)
        hi = jnp.where(any_valid, hi, 0.0)
        step = jnp.maximum((hi - lo) / 255.0, jnp.float32(1e-6))
        # quantization params are data statistics, not a gradient path;
        # grads w.r.t. KERNEL stay exact (k4 is linear in kernel below).
        # Grads w.r.t. feats are zero through round() — the int8 grid is
        # a frozen-input/inference formulation (conv0 consumes raw scene
        # colors; nothing trainable sits upstream).
        lo = jax.lax.stop_gradient(lo)
        step = jax.lax.stop_gradient(step)
        # fold the affine into the weights: stored value q in [-128, 127]
        # recovers f = (lo + 128*step)*occ + step*q, and occ rides the
        # pad lane as literal int8 1
        kf = kernel.astype(jnp.float32)
        kscaled = kf * step[None, :, None]                       # [125,3,C]
        occ_w = jnp.einsum("tco,c->to", kf, lo + 128.0 * step)
        k4 = jnp.concatenate([kscaled, occ_w[:, None, :]], axis=1)
        k4 = k4.reshape(125 * CH, C_out).astype(feats.dtype)
    else:
        lo = step = None
        k4 = jnp.pad(kernel, ((0, 0), (0, CH - C_in), (0, 0)))   # [125, 4, C]
        k4 = k4.reshape(125 * CH, C_out).astype(feats.dtype)
    WP = jnp.zeros((32, 20 * 128, C_out), feats.dtype)
    WP = WP.at[p_idx, m_idx].set(jnp.take(k4, t_idx, axis=0))
    WPmat = WP.transpose(1, 0, 2).reshape(20 * 128, 32 * C_out)

    def one_chunk(args):
        f, c, ext = args                                         # [bc, ...]
        bc = f.shape[0]
        xp = c[..., 0] + PAD
        yp = c[..., 1] + PAD
        zp = c[..., 2] + PAD
        row = (xp * ZC + (zp >> 3)) * NYG + (yp >> 2)            # [bc, V]
        row = jnp.where(ext, row, n_rows)                        # drop pads
        lane = (((yp & 3) << 3) + (zp & 7)) * CH                 # [bc, V]

        # scalar scatter into the flat 128-lane grid (a [.., 32, CH] grid
        # materializes CH-minor -> lane-padded 32x -> 36 GB at the SQA3D
        # extent; this keeps the only big buffer at exactly [n_rows, 128])
        bidx = jnp.arange(bc)[:, None]
        if int8_grid:
            # ONE packed int32 write per voxel: bytes [q0, q1, q2, occ=1]
            # little-endian (verified bitcast order), then reinterpret the
            # [n_rows, 32]-word grid as [n_rows, 128] int8 rows.
            # unique_indices holds by construction (one word per voxel,
            # voxels dedup'd): chip probe scat_i8_uniq 3.65 ms/sample
            # (scripts/mb_conv0_probe2.py).
            q = jnp.clip(jnp.round(
                (f.astype(jnp.float32) - lo) / step), 0.0, 255.0
            ).astype(jnp.int32) - 128
            word = ((q[..., 0] & 0xFF) | ((q[..., 1] & 0xFF) << 8)
                    | ((q[..., 2] & 0xFF) << 16) | (1 << 24))
            g32 = jnp.zeros((bc, n_rows, 32), jnp.int32)
            g32 = g32.at[bidx, row, lane // CH].set(
                word, mode="drop", unique_indices=_int8_unique_scatter)
            grid = jax.lax.bitcast_convert_type(g32, jnp.int8) \
                .reshape((bc * n_rows, 128) if _int8_flat_gather
                         else (bc, n_rows, 128))
        elif flat_scatter:
            # FLAT 2-D scatter into the [bc*n_rows, 128] table (probe #6:
            # 15.5 vs batched 18.1 ms/sample on the real rows). Invalid
            # voxels get an out-of-bounds flat row so mode="drop" keeps
            # the batched form's exact semantics (and uniqueness holds —
            # nothing lands on a shared pad row).
            fz = jnp.where(ext[..., None], f, 0)
            rowf = jnp.where(ext, row + bidx * n_rows, bc * n_rows)
            r3 = jnp.broadcast_to(rowf[..., None], (bc, V, C_in)).reshape(-1)
            l3 = (lane[..., None]
                  + jnp.arange(C_in, dtype=jnp.int32)).reshape(-1)
            grid = jnp.zeros((bc * n_rows, 128), f.dtype)
            grid = grid.at[r3, l3].set(
                fz.reshape(-1), mode="drop", unique_indices=unique_scatter)
            grid = grid.reshape(bc, n_rows, 128)
        else:
            fz = jnp.where(ext[..., None], f, 0)
            rows_c = jnp.broadcast_to(row[..., None], (bc, V, C_in))
            lanes_c = lane[..., None] + jnp.arange(C_in, dtype=jnp.int32)
            grid = jnp.zeros((bc, n_rows, 128), f.dtype)
            grid = grid.at[bidx, rows_c.reshape(bc, V * C_in),
                           lanes_c.reshape(bc, V * C_in)].set(
                fz.reshape(bc, V * C_in), mode="drop",
                unique_indices=unique_scatter)

        # window rows: (dx 5) x (z-chunk 2) x (y-group 2)
        c0 = (zp - PAD) >> 3
        g0 = (yp - PAD) >> 2
        # r[bc, V, 5dx, 2c, 2g]
        r = ((xp[..., None, None, None] + dxs[None, None, :, None, None])
             * ZC + c0[..., None, None, None]
             + jnp.arange(2, dtype=jnp.int32)[None, None, None, :, None]) \
            * NYG + g0[..., None, None, None] \
            + jnp.arange(2, dtype=jnp.int32)[None, None, None, None, :]
        r = jnp.where(ext[..., None, None, None], r, 0)
        if int8_grid and _int8_flat_gather:
            # FLAT t[i] gather: the batched take_along_axis form gathers
            # these rows at ~56 M rows/s while the flat unbatched form
            # runs 3.8x faster on int8 128 B rows (chip probes
            # mb_conv0_probe.py / mb_conv0_probe2.py)
            rf = (r.reshape(bc, V * 20)
                  + (jnp.arange(bc, dtype=jnp.int32) * n_rows)[:, None])
            win = grid[rf.reshape(-1)]                           # [bc*V*20, 128]
        elif flat_gather and not int8_grid:
            # bf16 flat t[i] gather (probe #4: 12.6 vs taa 14.9 ms/sample;
            # the grid here is natively laid out, unlike the int8 bitcast)
            rf = (r.reshape(bc, V * 20)
                  + (jnp.arange(bc, dtype=jnp.int32) * n_rows)[:, None])
            win = grid.reshape(bc * n_rows, 128)[rf.reshape(-1)]
        else:
            win = jnp.take_along_axis(grid, r.reshape(bc, V * 20)[..., None],
                                      axis=1)                    # [bc, V*20, 128]

        # one 2560-deep MXU matmul computes the conv for ALL 32 phases,
        # then the voxel's true phase block is selected one-hot
        out_all = jnp.einsum(
            "bvm,mq->bvq",
            win.reshape(bc, V, 20 * 128).astype(f.dtype), WPmat,
            preferred_element_type=jnp.float32,
            precision=precision).astype(f.dtype)                 # [bc,V,32*C]
        phase = ((yp - PAD) & 3) * 8 + ((zp - PAD) & 7)          # [bc, V]
        oh = jax.nn.one_hot(phase, 32, dtype=f.dtype)
        out = jnp.einsum("bvpo,bvp->bvo",
                         out_all.reshape(bc, V, 32, C_out), oh,
                         preferred_element_type=jnp.float32,
                         precision=precision)
        return jnp.where(ext[..., None], out, 0).astype(f.dtype)

    bc = batch_chunk if B % batch_chunk == 0 else 1
    if bc == B:
        out = one_chunk((feats, coords, in_extent))
    else:
        out = jax.lax.map(one_chunk, (
            feats.reshape(B // bc, bc, V, C_in),
            coords.reshape(B // bc, bc, V, 3),
            in_extent.reshape(B // bc, bc, V)))
        out = out.reshape(B, V, C_out)
    return out, misses


@functools.lru_cache(maxsize=4)
def _zwin_k3_phase_maps(c_in: int):
    """Static (phase, window-position, kernel-tap) index triplets for the
    k3 z-window conv's phase-expanded weight scatter (:func:`sparse_conv_k3_zwin`).

    Lane packing: ``2 y-cells x 2 z-cells x c_in`` channels per 128-lane
    row (c_in == 32). For a voxel of phase ``py = cy & 1``, ``pz = cz & 1``
    and kernel tap ``(dx, j, k, ch)`` (y offset j-1, z offset k-1), the tap
    sits in the gathered ``[12, 128]`` window block at flat position
    ``m = ((dx*2 + cc)*2 + gg)*128 + ((w&1)*2 + (u&1))*c_in + ch`` with
    ``w, u = py + j, pz + k`` and ``gg, cc = w >> 1, u >> 1`` — matching
    the scatter's lane packing and the window row order
    ``(dx, z-chunk, y-group)``. Kernel taps index the flattened
    ``[27*c_in, C_out]`` kernel in kernel_offsets(3) order (x slowest)."""
    py, pz, dx, j, k, ch = np.meshgrid(
        np.arange(2), np.arange(2), np.arange(3), np.arange(3), np.arange(3),
        np.arange(c_in), indexing="ij")
    w = py + j
    u = pz + k
    p_idx = (py * 2 + pz).ravel()
    m_idx = (((dx * 2 + (u >> 1)) * 2 + (w >> 1)) * 128
             + ((w & 1) * 2 + (u & 1)) * c_in + ch).ravel()
    t_idx = (((dx * 3 + j) * 3 + k) * c_in + ch).ravel()
    return (np.asarray(p_idx, np.int32), np.asarray(m_idx, np.int32),
            np.asarray(t_idx, np.int32))


def sparse_conv_k3_zwin(
    feats: jnp.ndarray,
    coords: jnp.ndarray,
    mask: jnp.ndarray,
    kernel: jnp.ndarray,
    extent,
    stride: int,
    precision=None,
    batch_chunk: int = 2,
) -> jnp.ndarray:
    """k3 same-stride sparse conv via a window-packed dense feature grid —
    the :func:`sparse_conv0_zwin` formulation at C_in == 32 (the level-1
    ResLayer class, the one conv family left on the XLA gather path:
    4 convs/sample at C32, K*V_out >= 0.5M rows, where both the fused
    Pallas kernel and the plain VMEM gather measured slower than XLA).

    Per conv this replaces 27 x V 64 B feature-row gathers (~20 ns/row,
    the XLA small-row regime) + the shared level k3 kernel map
    (27 x V single-int32 grid gathers in the plan) with:

    1. one row-granular scatter-add of V 256 B rows into a dense grid
       whose 128-lane rows pack ``2 y-cells x 2 z-cells x 32 ch`` (zero
       layout padding; each (row, lane) receives at most one voxel's
       channel, so the add is collision-exact and deterministic);
    2. 12 contiguous 256 B window-row gathers per voxel
       (3 dx x 2 z-chunks x 2 y-groups covering the 3x3x3 neighborhood);
    3. one 1536-deep MXU contraction against the PHASE-EXPANDED weight
       matrix ``[12*128, 4*C_out]`` (tap positions depend only on the
       voxel's ``(cy & 1, cz & 1)`` phase — 4 cases), then a one-hot
       phase select (exactly one nonzero term — selection-exact).

    Numerics: identical to the kernel-map path up to f32 summation order
    for in-extent voxels; out-of-extent voxels output zero (with the
    default ``dense_downsample`` such voxels are already dropped at
    downsample time, so levels >= 1 never contain them).

    Args:
      feats: [B, V, 32] (padding rows zero); coords int32 [B, V, 3] raw
        units (multiples of ``stride``); mask bool [B, V]; kernel
        [27, 32, C_out] in kernel_offsets(3) order (x slowest); extent
        static raw-unit bound; stride the level's tensor stride.
    Returns [B, V, C_out].
    """
    B, V, C_in = feats.shape
    assert C_in == 32, "z-window k3 conv packs 4 voxels per 128-lane row"
    C_out = kernel.shape[-1]
    CX, CY, CZ = (e // stride for e in extent)
    XP = CX + 2                      # one pad cell per side (k3 reach)
    NYG = (CY - 1) // 2 + 2          # y-groups of 2 (y' = cy + 1)
    ZC = (CZ - 1) // 2 + 2           # z-chunks of 2
    n_rows = XP * ZC * NYG

    c = coords // stride
    in_extent = mask & jnp.all(c >= 0, axis=-1) \
        & (c[..., 0] < CX) & (c[..., 1] < CY) & (c[..., 2] < CZ)

    p_idx, m_idx, t_idx = _zwin_k3_phase_maps(C_in)
    kf = kernel.reshape(27 * C_in, C_out).astype(feats.dtype)
    WP = jnp.zeros((4, 12 * 128, C_out), feats.dtype)
    WP = WP.at[p_idx, m_idx].set(jnp.take(kf, t_idx, axis=0))
    WPmat = WP.transpose(1, 0, 2).reshape(12 * 128, 4 * C_out)
    dxs = np.arange(-1, 2, dtype=np.int32)                       # [3]

    def one_chunk(args):
        f, cc3, ext = args                                       # [bc, ...]
        bc = f.shape[0]
        xp = cc3[..., 0] + 1
        yp = cc3[..., 1] + 1
        zp = cc3[..., 2] + 1
        row = (xp * ZC + (zp >> 1)) * NYG + (yp >> 1)            # [bc, V]
        row = jnp.where(ext, row, n_rows)                        # drop pads
        slot = (yp & 1) * 2 + (zp & 1)                           # [bc, V]

        # place the 32 channels at lane slot*32 via 4 static pads (a
        # one-hot einsum would materialize a lane-padded [.., 4, 32]
        # minor; pads keep every big intermediate at a 128 minor)
        fz = jnp.where(ext[..., None], f, 0)
        f128 = jnp.zeros((bc, V, 128), f.dtype)
        for s in range(4):
            fs = jnp.pad(fz, ((0, 0), (0, 0), (32 * s, 96 - 32 * s)))
            f128 = jnp.where((slot == s)[..., None], fs, f128)
        # row-granular scatter-add: disjoint (row, lane) targets per voxel
        # channel, all other lanes zero -> exact and order-independent
        grid = jnp.zeros((bc, n_rows, 128), f.dtype)
        grid = grid.at[jnp.arange(bc)[:, None], row].add(f128, mode="drop")

        # window rows: (dx 3) x (z-chunk 2) x (y-group 2)
        c0 = (zp - 1) >> 1
        g0 = (yp - 1) >> 1
        r = ((xp[..., None, None, None] + dxs[None, None, :, None, None])
             * ZC + c0[..., None, None, None]
             + jnp.arange(2, dtype=jnp.int32)[None, None, None, :, None]) \
            * NYG + g0[..., None, None, None] \
            + jnp.arange(2, dtype=jnp.int32)[None, None, None, None, :]
        r = jnp.where(ext[..., None, None, None], r, 0)
        win = jnp.take_along_axis(grid, r.reshape(bc, V * 12)[..., None],
                                  axis=1)                        # [bc, V*12, 128]

        # one 1536-deep MXU matmul for ALL 4 phases + one-hot select
        out_all = jnp.einsum(
            "bvm,mq->bvq", win.reshape(bc, V, 12 * 128), WPmat,
            preferred_element_type=jnp.float32,
            precision=precision).astype(f.dtype)                 # [bc,V,4*C]
        phase = ((yp - 1) & 1) * 2 + ((zp - 1) & 1)
        oh = jax.nn.one_hot(phase, 4, dtype=f.dtype)
        out = jnp.einsum("bvpo,bvp->bvo",
                         out_all.reshape(bc, V, 4, C_out), oh,
                         preferred_element_type=jnp.float32,
                         precision=precision)
        return jnp.where(ext[..., None], out, 0).astype(f.dtype)

    bc = batch_chunk if B % batch_chunk == 0 else 1
    if bc == B:
        return one_chunk((feats, c, in_extent))
    out = jax.lax.map(one_chunk, (
        feats.reshape(B // bc, bc, V, C_in),
        c.reshape(B // bc, bc, V, 3),
        in_extent.reshape(B // bc, bc, V)))
    return out.reshape(B, V, C_out)


def zwin_res_layer_shared(
    feats: jnp.ndarray,
    coords: jnp.ndarray,
    mask: jnp.ndarray,
    blocks,
    extent,
    stride: int,
    eps: float = 1e-5,
    precision=None,
    batch_chunk: int = 2,
) -> jnp.ndarray:
    """A whole same-stride C32 ResLayer (conv3-bn-relu-conv3-bn + skip,
    xN blocks) on the z-window formulation with ONE shared dense grid.

    The round-3 per-conv z-window at level 1 (:func:`sparse_conv_k3_zwin`)
    measured an end-to-end LOSS (DESIGN.md §10): the ~554 MB/sample grid
    memset was paid once per conv — 4x/sample — and the per-conv row/phase
    index math repeated 4x. But the 4 level-1 convs share identical
    coordinates, hence identical grid rows and lane slots, so:

    1. the grid is ALLOCATED AND ZEROED ONCE per sample (the dominant §10(a)
       cost), then threaded through the convs;
    2. between convs, the previous features are cleared with one
       row-granular ``.set(0)`` scatter and the new features written with
       one ``.at[].add`` — two 6 MB row scatters instead of a 554 MB memset.
       Clear-then-add over identical row targets makes each conv's grid
       bit-identical to a fresh ``zeros().at[].add``, so outputs are
       bit-exact vs the per-conv path (tested);
    3. the row / lane-slot / window-row / phase index math (loop-invariant
       across the convs, ``sparse/conv.py:547-581`` in the per-conv form)
       is hoisted and computed once.

    BatchNorm runs in EVAL form (running statistics — per-voxel affine, so
    it chunks with the batch); the caller routes training forwards to the
    kernel-map path, where batch statistics need the whole batch.

    Args:
      feats: [B, V, 32] level features (padding rows zero).
      coords: int32 [B, V, 3] raw units (multiples of ``stride``).
      mask: bool [B, V].
      blocks: sequence over ResLayer blocks of
        ``(kernel1, (scale1, bias1, mean1, var1), kernel2, (...2))`` with
        kernels [27, 32, C_out=32] in kernel_offsets(3) order.
      extent: static raw-unit grid bound; stride: the level's tensor stride.
    Returns [B, V, 32] — the ResLayer output features.
    """
    B, V, C_in = feats.shape
    assert C_in == 32, "z-window k3 conv packs 4 voxels per 128-lane row"
    for k1, _, k2, _ in blocks:
        assert k1.shape == (27, C_in, C_in) and k2.shape == (27, C_in, C_in)
    dtype = feats.dtype
    C_out = C_in
    CX, CY, CZ = (e // stride for e in extent)
    XP = CX + 2
    NYG = (CY - 1) // 2 + 2
    ZC = (CZ - 1) // 2 + 2
    n_rows = XP * ZC * NYG

    c = coords // stride
    in_extent = mask & jnp.all(c >= 0, axis=-1) \
        & (c[..., 0] < CX) & (c[..., 1] < CY) & (c[..., 2] < CZ)

    p_idx, m_idx, t_idx = _zwin_k3_phase_maps(C_in)

    def phase_mat(kernel):
        kf = kernel.reshape(27 * C_in, C_out).astype(dtype)
        WP = jnp.zeros((4, 12 * 128, C_out), dtype)
        WP = WP.at[p_idx, m_idx].set(jnp.take(kf, t_idx, axis=0))
        return WP.transpose(1, 0, 2).reshape(12 * 128, 4 * C_out)

    mats = [(phase_mat(k1), bn1, phase_mat(k2), bn2)
            for k1, bn1, k2, bn2 in blocks]
    dxs = np.arange(-1, 2, dtype=np.int32)

    def one_chunk(args):
        f, cc3, ext, msk = args                                  # [bc, ...]
        bc = f.shape[0]
        xp = cc3[..., 0] + 1
        yp = cc3[..., 1] + 1
        zp = cc3[..., 2] + 1
        # hoisted (identical for every conv in the layer):
        row = (xp * ZC + (zp >> 1)) * NYG + (yp >> 1)            # [bc, V]
        row = jnp.where(ext, row, n_rows)                        # drop pads
        slot = (yp & 1) * 2 + (zp & 1)                           # [bc, V]
        c0 = (zp - 1) >> 1
        g0 = (yp - 1) >> 1
        r = ((xp[..., None, None, None] + dxs[None, None, :, None, None])
             * ZC + c0[..., None, None, None]
             + jnp.arange(2, dtype=jnp.int32)[None, None, None, :, None]) \
            * NYG + g0[..., None, None, None] \
            + jnp.arange(2, dtype=jnp.int32)[None, None, None, None, :]
        r = jnp.where(ext[..., None, None, None], r, 0)
        ridx = r.reshape(bc, V * 12)[..., None]
        phase = ((yp - 1) & 1) * 2 + ((zp - 1) & 1)
        oh = jax.nn.one_hot(phase, 4, dtype=dtype)
        bidx = jnp.arange(bc)[:, None]

        def pack(fv):
            # lane slot*32 placement via 4 static pads (see
            # sparse_conv_k3_zwin — avoids a lane-padded [.., 4, 32] minor)
            fz = jnp.where(ext[..., None], fv, 0)
            f128 = jnp.zeros((bc, V, 128), dtype)
            for s in range(4):
                fs = jnp.pad(fz, ((0, 0), (0, 0), (32 * s, 96 - 32 * s)))
                f128 = jnp.where((slot == s)[..., None], fs, f128)
            return f128

        def conv(grid, fv, WPmat, first):
            f128 = pack(fv)
            if not first:
                # row-granular clear of the previous conv's rows: identical
                # row targets, so the grid after clear+add is bit-identical
                # to a fresh zeros+add — without the full-grid memset
                grid = grid.at[bidx, row].set(
                    jnp.zeros_like(f128), mode="drop")
            grid = grid.at[bidx, row].add(f128, mode="drop")
            win = jnp.take_along_axis(grid, ridx, axis=1)        # [bc,V*12,128]
            out_all = jnp.einsum(
                "bvm,mq->bvq", win.reshape(bc, V, 12 * 128), WPmat,
                preferred_element_type=jnp.float32,
                precision=precision).astype(dtype)               # [bc,V,4*C]
            out = jnp.einsum("bvpo,bvp->bvo",
                             out_all.reshape(bc, V, 4, C_out), oh,
                             preferred_element_type=jnp.float32,
                             precision=precision)
            out = jnp.where(ext[..., None], out, 0).astype(dtype)
            # SparseConv.__call__'s output masking (x.mask, not in_extent)
            return grid, jnp.where(msk[..., None], out, 0)

        def bn_eval(fv, bn):
            scale, bias, mean, var = bn
            inv = jax.lax.rsqrt(var + eps) * scale
            out = (fv.astype(jnp.float32) - mean) * inv + bias
            return jnp.where(msk[..., None], out, 0).astype(dtype)

        h = f
        grid = jnp.zeros((bc, n_rows, 128), dtype)
        first = True
        for k1m, bn1, k2m, bn2 in mats:
            residual = h
            grid, o = conv(grid, h, k1m, first)
            first = False
            h = jnp.maximum(bn_eval(o, bn1), 0)
            grid, o = conv(grid, h, k2m, False)
            h = jnp.maximum(bn_eval(o, bn2) + residual, 0)
        return h

    bc = batch_chunk if B % batch_chunk == 0 else 1
    if bc == B:
        return one_chunk((feats, c, in_extent, mask))
    out = jax.lax.map(one_chunk, (
        feats.reshape(B // bc, bc, V, C_in),
        c.reshape(B // bc, bc, V, 3),
        in_extent.reshape(B // bc, bc, V),
        mask.reshape(B // bc, bc, V)))
    return out.reshape(B, V, C_out)


def sparse_conv_dense_grid(
    feats: jnp.ndarray,
    coords: jnp.ndarray,
    mask: jnp.ndarray,
    stride: int,
    kernel: jnp.ndarray,
    extent,
) -> jnp.ndarray:
    """k3 same-stride sparse conv computed as a dense XLA conv3d.

    At coarse strides (>=4) the voxel grid is small (extent/stride^3 cells),
    so scatter -> conv3d -> gather beats per-offset gathers: the gather
    engine caps at ~12-14 GB/s while conv3d rides the MXU over the (mostly
    empty) dense grid. Exactly equivalent to the gather path for the
    hypercube kernel: correlation out[p] = sum_o x[p+o] W_o with zero
    padding, empty cells zero.

    Args:
      feats [B, V, C_in] (padding rows zero); coords int32 [B, V, 3] raw
      units (multiples of stride); mask [B, V]; kernel [27, C_in, C_out] in
      kernel_offsets(3) order (x slowest); extent static (X, Y, Z) raw bound.
    """
    B, V, C_in = feats.shape
    C_out = kernel.shape[-1]
    dx, dy, dz = (e // stride for e in extent)
    c = jnp.clip(coords // stride, 0, jnp.asarray([dx - 1, dy - 1, dz - 1]))
    flat = (c[..., 0] * dy + c[..., 1]) * dz + c[..., 2]           # [B, V]
    flat = jnp.where(mask, flat, dx * dy * dz)                     # drop pads
    grid = jnp.zeros((B, dx * dy * dz, C_in), feats.dtype)
    grid = grid.at[jnp.arange(B)[:, None], flat].set(
        jnp.where(mask[..., None], feats, 0), mode="drop")
    grid = grid.reshape(B, dx, dy, dz, C_in)
    rhs = kernel.reshape(3, 3, 3, C_in, C_out).astype(feats.dtype)
    out_grid = jax.lax.conv_general_dilated(
        grid, rhs, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)
    out_grid = out_grid.reshape(B, dx * dy * dz, C_out)
    safe = jnp.where(mask, flat, 0)
    out = jnp.take_along_axis(out_grid, safe[..., None], axis=1)
    return jnp.where(mask[..., None], out, 0).astype(feats.dtype)
