"""Space-to-depth (fold-X) 3-D convolution — the MXU-saturating formulation.

Measured on v5e: a stride-1 3x3x3 conv over the RT-Pose grid takes the SAME
wall time for 32 output channels as for 128 (9.4 / 36.7 / 165.6 TFLOP/s for
C32->C32 / C32->C128 / C128->C128) — the MXU is 128 lanes wide and
thin-channel convs waste it.  Folding 4 X-positions into channels makes
every conv 128-lane wide; a 6-conv chain measured 1.58 ms/conv folded vs
4.52 ms/conv naive (2.9x) with the fold/unfold relayouts amortized at the
network boundary.

The folded kernel is an EXACT rearrangement: output sub-position fo reading
original tap d lands at folded tap s = floor((stride*fo + d)/4), input
sub-lane fi = (stride*fo + d) mod 4.  The zero structure guarantees folded
padding (4 zeros per cell) contributes exactly the original k//2-zero
padding — boundary-exact, verified by tests for k in {1, 3}, stride in
{1, 2}.

Parameters stay in the canonical (kz, ky, kx, C, Co) layout (checkpoints
identical to the naive path); the rearrangement is a tiny scatter folded
into the compiled program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

FOLD = 4


@functools.lru_cache(maxsize=None)
def _fold_entries(kx: int, stride: int):
    """[(fo, dx, s, fi)] plus (s_min, s_max) for the folded X kernel."""
    entries = []
    s_min, s_max = 0, 0
    for fo in range(FOLD):
        for dx in range(kx):
            d = dx - kx // 2
            pos = stride * fo + d
            s = pos // FOLD
            fi = pos % FOLD
            entries.append((fo, dx, s, fi))
            s_min = min(s_min, s)
            s_max = max(s_max, s)
    return entries, s_min, s_max


def fold_weights_x4(w: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    """(kz, ky, kx, C, Co) -> (kz, ky, Wf, 4C, 4Co) folded kernel."""
    kz, ky, kx, C, Co = w.shape
    entries, s_min, s_max = _fold_entries(kx, stride)
    width = s_max - s_min + 1
    out = jnp.zeros((kz, ky, width, FOLD, C, FOLD, Co), w.dtype)
    for fo, dx, s, fi in entries:
        out = out.at[:, :, s - s_min, fi, :, fo, :].set(w[:, :, dx])
    return out.reshape(kz, ky, width, FOLD * C, FOLD * Co)


def fold_weights_concat(w: jnp.ndarray, block_channels, stride: int = 1) -> jnp.ndarray:
    """Folded kernel for an input that is a CONCAT of folded tensors.

    Concatenating folded tensors on the channel axis yields per-block
    fi-major layout (folded index within block b = fi * C_b + c), NOT the
    global fi-major layout — the folded weights must be built against that
    structure.  ``w``: (kz, ky, kx, sum(block_channels), Co).
    """
    kz, ky, kx, C_total, Co = w.shape
    assert sum(block_channels) == C_total, (block_channels, C_total)
    entries, s_min, s_max = _fold_entries(kx, stride)
    width = s_max - s_min + 1
    Cf_in = FOLD * C_total
    out = jnp.zeros((kz, ky, width, Cf_in, FOLD, Co), w.dtype)
    off_f = 0   # offset in folded input channels
    off_c = 0   # offset in original channels
    for Cb in block_channels:
        for fo, dx, s, fi in entries:
            rows = off_f + fi * Cb + jnp.arange(Cb)
            out = out.at[:, :, s - s_min, rows, fo, :].set(
                w[:, :, dx, off_c : off_c + Cb, :])
        off_f += FOLD * Cb
        off_c += Cb
    return out.reshape(kz, ky, width, Cf_in, FOLD * Co)


def conv3d_folded_concat(xf: jnp.ndarray, w: jnp.ndarray, block_channels,
                         bias: jnp.ndarray | None = None, stride: int = 1
                         ) -> jnp.ndarray:
    """conv3d_folded for a concat-of-folded-tensors input."""
    kz, ky, kx, C_total, Co = w.shape
    entries, s_min, s_max = _fold_entries(kx, stride)
    wf = fold_weights_concat(w.astype(xf.dtype), tuple(block_channels), stride)
    pad = [(kz // 2, kz // 2), (ky // 2, ky // 2), (-s_min, s_max)]
    out = lax.conv_general_dilated(
        xf, wf, (stride, stride, stride), pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    if bias is not None:
        out = out + jnp.tile(bias, FOLD).astype(out.dtype)
    return out


def fold_x(x: jnp.ndarray) -> jnp.ndarray:
    """(B, Z, Y, X, C) -> (B, Z, Y, X/4, 4C) (pure reshape)."""
    B, Z, Y, X, C = x.shape
    assert X % FOLD == 0, X
    return x.reshape(B, Z, Y, X // FOLD, FOLD * C)


def unfold_x(x: jnp.ndarray) -> jnp.ndarray:
    """(B, Z, Y, X', 4C) -> (B, Z, Y, 4X', C)."""
    B, Z, Y, Xf, Cf = x.shape
    assert Cf % FOLD == 0, Cf
    return x.reshape(B, Z, Y, Xf * FOLD, Cf // FOLD)


def conv3d_folded(xf: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray | None = None,
                  stride: int = 1) -> jnp.ndarray:
    """Conv on an already-folded tensor.

    xf: (B, Z, Y, X', 4C); w: canonical (kz, ky, kx, C, Co).
    Z/Y use torch padding k//2 and the given stride; X uses the folded
    mapping (original pad kx//2, original stride ``stride``).
    Returns (B, Z_out, Y_out, X'_out, 4Co).
    """
    kz, ky, kx, C, Co = w.shape
    assert xf.shape[-1] == FOLD * C, (xf.shape, C)
    entries, s_min, s_max = _fold_entries(kx, stride)
    wf = fold_weights_x4(w.astype(xf.dtype), stride)
    pad = [(kz // 2, kz // 2), (ky // 2, ky // 2), (-s_min, s_max)]
    out = lax.conv_general_dilated(
        xf, wf, (stride, stride, stride), pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    if bias is not None:
        out = out + jnp.tile(bias, FOLD).astype(out.dtype)
    return out


def conv3d_folded_1x1(xf: jnp.ndarray, w: jnp.ndarray,
                      bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Stride-1 1x1x1 conv on a folded tensor as a lane-wise matmul.

    KEPT AS A DOCUMENTED NEGATIVE RESULT (exactness-tested, not on the
    model path): the folded layout is fi-major so the (4C) -> (4, C)
    reshape is a free *index* rearrangement and the conv is one
    (…, C) @ (C, Co) contraction — x4 fewer issued FLOPs than the
    block-diagonal folded kernel on paper.  Measured on v5e it is 2.4-4x
    SLOWER: splitting the folded lane dimension makes C the minor axis
    (32/64 < the 128-lane tile), forcing relayout/transposes that dwarf
    the saved multiplies.  Same conclusion for the int8 variant and the
    concat form below (see BASELINE.md negative results, round 4)."""
    kz, ky, kx, C, Co = w.shape
    assert (kz, ky, kx) == (1, 1, 1), w.shape
    B, Z, Y, Xf, Cf = xf.shape
    assert Cf == FOLD * C, (xf.shape, C)
    xr = xf.reshape(B, Z, Y, Xf, FOLD, C)
    out = jnp.einsum("bzyxfc,co->bzyxfo", xr, w[0, 0, 0].astype(xf.dtype))
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.reshape(B, Z, Y, Xf, FOLD * Co)


def unfold_concat_lanes(xf: jnp.ndarray, block_channels) -> jnp.ndarray:
    """(B, Z, Y, X', sum(4*Cb)) concat-of-folded -> (B, Z, Y, X', 4, sum(Cb)).

    A concat of folded tensors is per-block fi-major; regrouping to a global
    (fold, channel) pair needs one split+concat relayout (cheap: channel-dim
    only, no spatial movement)."""
    parts = []
    off = 0
    B, Z, Y, Xf, _ = xf.shape
    for Cb in block_channels:
        blk = xf[..., off:off + FOLD * Cb].reshape(B, Z, Y, Xf, FOLD, Cb)
        parts.append(blk)
        off += FOLD * Cb
    return jnp.concatenate(parts, axis=-1)


def conv3d_folded_concat_1x1(xf: jnp.ndarray, w: jnp.ndarray, block_channels,
                             bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Stride-1 1x1x1 conv on a concat-of-folded input as one matmul —
    exact same outputs/layout as conv3d_folded_concat for k=1, s=1, but a
    documented NEGATIVE RESULT (12.3 vs 3.2 ms bf16 on the 192->128 final
    fuse conv): see conv3d_folded_1x1."""
    kz, ky, kx, C_total, Co = w.shape
    assert (kz, ky, kx) == (1, 1, 1), w.shape
    B, Z, Y, Xf, _ = xf.shape
    xr = unfold_concat_lanes(xf, tuple(block_channels))
    out = jnp.einsum("bzyxfc,co->bzyxfo", xr, w[0, 0, 0].astype(xf.dtype))
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.reshape(B, Z, Y, Xf, FOLD * Co)


def gather_taps_x(xf: jnp.ndarray, kx: int) -> jnp.ndarray:
    """(B, Z, Y, X', F*C) folded -> (B, Z, Y, X', (F+kx-1)*C) tap groups.

    Group g holds original position F*x' + g - kx//2 (zero-padded at the
    volume edges, matching torch's kx//2 conv padding).  The groups for
    q in [0, F) are xf itself; only the kx//2 boundary lanes on each side
    are sliced from the neighbor cells — a cheap (2*C-lane) relayout.
    """
    h = kx // 2
    B, Z, Y, Xf, Cf = xf.shape
    C = Cf // FOLD
    parts = []
    for q in range(-h, 0):                      # cell x'-1, lane F+q
        fi = q % FOLD
        prev = jnp.pad(xf[:, :, :, :-1, fi * C:(fi + 1) * C],
                       [(0, 0), (0, 0), (0, 0), (1, 0), (0, 0)])
        parts.append(prev)
    parts.append(xf)
    for q in range(FOLD, FOLD + h):             # cell x'+1, lane q-F
        fi = q % FOLD
        nxt = jnp.pad(xf[:, :, :, 1:, fi * C:(fi + 1) * C],
                      [(0, 0), (0, 0), (0, 0), (0, 1), (0, 0)])
        parts.append(nxt)
    return jnp.concatenate(parts, axis=-1)


def gather_weights_x(w: jnp.ndarray) -> jnp.ndarray:
    """(kz, ky, kx, C, Co) -> (kz, ky, 1, (FOLD+kx-1)*C, FOLD*Co) kernel for
    the gathered-tap layout: output lane fo reads tap groups g = fo + dx."""
    kz, ky, kx, C, Co = w.shape
    n_pos = FOLD + kx - 1
    out = jnp.zeros((kz, ky, 1, n_pos, C, FOLD, Co), w.dtype)
    for fo in range(FOLD):
        for dx in range(kx):
            out = out.at[:, :, 0, fo + dx, :, fo, :].set(w[:, :, dx])
    return out.reshape(kz, ky, 1, n_pos * C, FOLD * Co)


def conv3d_folded_gather(xf: jnp.ndarray, w: jnp.ndarray,
                         bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Stride-1 folded conv via tap gathering — (FOLD+kx-1)/kx issued-FLOP
    factor instead of conv3d_folded's width*FOLD/kx (2x vs 4x for kx=3),
    at the same full-lane MXU utilization.  Exact same outputs/layout as
    conv3d_folded (verified in f64 by tests)."""
    kz, ky, kx, C, Co = w.shape
    assert xf.shape[-1] == FOLD * C, (xf.shape, C)
    assert kx % 2 == 1, (
        f"conv3d_folded_gather needs an odd X kernel (symmetric taps); "
        f"got kx={kx} — use conv3d_folded for even kernels")
    g = gather_taps_x(xf, kx)
    wf = gather_weights_x(w.astype(xf.dtype))
    pad = [(kz // 2, kz // 2), (ky // 2, ky // 2), (0, 0)]
    out = lax.conv_general_dilated(
        g, wf, (1, 1, 1), pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    if bias is not None:
        out = out + jnp.tile(bias, FOLD).astype(out.dtype)
    return out


def conv3d_fold4(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray | None = None,
                 stride: int = 1) -> jnp.ndarray:
    """Fold -> conv -> unfold convenience wrapper (for testing; in the model
    the whole network stays folded)."""
    return unfold_x(conv3d_folded(fold_x(x), w, bias, stride))


def conv3d_naive(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray | None = None,
                 stride: int = 1) -> jnp.ndarray:
    """Plain lax conv3d with torch padding (reference semantics)."""
    kz, ky, kx = w.shape[:3]
    pad = [(kz // 2, kz // 2), (ky // 2, ky // 2), (kx // 2, kx // 2)]
    out = lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride,) * 3, pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def group_norm_folded(xf: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                      num_groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over ORIGINAL channel groups on a folded tensor.

    Folded channel index = fi * C + c, so group membership depends only on
    c = idx % C... (reshape (X, C) -> (X/4, 4C) interleaves as fi-major).
    Statistics therefore reduce over (Z, Y, X', fold-lanes, group-channels):
    computed as per-folded-channel moments (tiny (B, 4C) tensors) followed
    by a grouped average — no relayout of the activation.
    """
    B = xf.shape[0]
    Cf = xf.shape[-1]
    C = Cf // FOLD
    assert C % num_groups == 0 or num_groups == 1
    gsize = C // num_groups if num_groups > 1 else C

    dt = jnp.promote_types(xf.dtype, jnp.float32)
    x32 = xf.astype(dt)
    n_spatial = int(np.prod(xf.shape[1:-1]))
    red = tuple(range(1, xf.ndim - 1))

    ng = num_groups if num_groups > 1 else 1
    cnt = n_spatial * FOLD * gsize
    shape = (B,) + (1,) * (xf.ndim - 2) + (Cf,)

    # group id of folded channel idx: (idx % C) // gsize.  A reshape-based
    # grouped reduce ((B, FOLD, ng, gsize).sum) is mathematically identical
    # and avoids the scatter, but empirically broke training on the real
    # chip (480-frame skeleton run: loc loss plateaus at ~47 instead of
    # annealing to ~2; bisected to this exact change, single-step outputs
    # agree to ~1e-4) — keep the round-2 scatter form, which reproduces the
    # good trajectory bit-for-bit.
    c_of = jnp.arange(Cf) % C
    gid = (c_of // gsize).astype(jnp.int32) if num_groups > 1 else jnp.zeros((Cf,), jnp.int32)

    # two-pass centered variance (E[x^2]-E[x]^2 cancels catastrophically)
    s1 = jnp.sum(x32, axis=red)                               # (B, 4C)
    gs1 = jnp.zeros((B, ng), dt).at[:, gid].add(s1)
    mean = gs1 / cnt
    mean_c = mean[:, gid]                                     # (B, 4C)
    centered = x32 - mean_c.reshape(shape)
    s2 = jnp.sum(jnp.square(centered), axis=red)
    gs2 = jnp.zeros((B, ng), dt).at[:, gid].add(s2)
    var = gs2 / cnt

    inv = jax.lax.rsqrt(var + eps)[:, gid]
    scale_f = jnp.tile(scale.astype(dt), FOLD)
    bias_f = jnp.tile(bias.astype(dt), FOLD)
    out = centered * (inv.reshape(shape) * scale_f) + bias_f
    return out.astype(xf.dtype)
