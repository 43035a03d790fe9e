"""ROI feature pooler (d2 ``ROIPooler`` + WSOVOD extensions).

Reference ``wsovod/modeling/poolers.py:24-337``. Supports:

* single- and multi-level pooling with canonical level assignment by box size
  (or an explicit ``valid_range`` per level);
* MRRP branch routing: with branch-concat features ``[n_br*B, H, W, C]``, a
  proposal's ``level_ids // 1000`` picks the branch whose feature copy it
  pools from (reference ``poolers.py:111-116,245-258``);
* ``ROILoopPool``: triple ROI/frame/context pooling — output rows are stacked
  3x along a leading axis, the contract the ROI heads' chunk-3 logic depends
  on (reference ``poolers.py:306-336``).

Everything is batched: boxes ``[B, P, 4]`` against features ``[B(*br), ...]``
with all-pad ROIs pooling to zeros. On TPU, pooling runs through the ops in
``wsovod_tpu.ops`` (jnp reference now; Pallas fast path plugs in underneath
without changing this interface).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.roi_pool import roi_align, roi_loop_pool, roi_pool
from ..structures.boxes import box_area


def assign_boxes_to_levels(
    boxes: jnp.ndarray,  # [..., 4]
    min_level: int,
    max_level: int,
    canonical_box_size: float = 224.0,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """FPN canonical level assignment (d2 semantics)."""
    sqrt_area = jnp.sqrt(jnp.maximum(box_area(boxes), 1e-8))
    lvl = jnp.floor(canonical_level + jnp.log2(sqrt_area / canonical_box_size + 1e-8))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32) - min_level


class ChunkThunk:
    """Deferred pooled-channel chunk for the training path: calling it runs
    the fused pool kernel for its channel range. ``ChunkedDenseGeneral``
    wraps each (thunk -> fc1 partial product) unit in ``jax.checkpoint`` so
    the pooled chunk is RECOMPUTED in backward instead of being saved as an
    einsum residual — the saved chunks are ~1.4 GB each at the MRRP/COCO
    budget (8 x 1.42 GB OOM'd a 16 GB chip; measured r3)."""

    def __init__(self, fn, shape, dtype):
        self.fn = fn
        self.shape = shape
        self.dtype = dtype

    def __call__(self):
        return self.fn()


class SegmentedChunks:
    """Width-split fused pooling result: the ROI axis is partitioned into
    contiguous segments (width-sorted), each with its own channel-chunk list
    pooled at the smallest x-window covering it. The caller runs the DAN per
    segment and concatenates the [B, P_seg, F] outputs along the ROI axis
    (cheap) before applying ``unsort_idx`` — concatenating the pooled chunks
    themselves would re-materialize the multi-GB tensor."""

    def __init__(self, segments, sizes=None):
        self.segments = segments  # list of per-segment chunk lists
        # per-segment ROI row counts (post any branch padding) so a train
        # caller can slice its segment-order [B, N'] fc1 row gate to match
        self.sizes = sizes


def branch_partition(
    boxes: jnp.ndarray,  # [B, N, 4]
    gate: jnp.ndarray,  # [B, N]
    branch: jnp.ndarray,  # [B, N] int32 in [0, n_br)
    n_br: int,
    roi_block: int = 8,
):
    """Stable-sort ROIs by MRRP branch id into branch-PURE ``roi_block``
    segments for the branched fused pooling kernel.

    Each branch's ROIs are packed contiguously, with the segment padded to a
    ``roi_block`` multiple by gate-0 zero-box rows, so every kernel block
    reads from exactly one branch's feature copy. Returns
    ``(boxes_s [B, N', 4], gate_s [B, N'], branch_s [B, N'], unsort_idx
    [B, N])`` with ``N' = ceil(N/RB)*RB + n_br*RB`` (static);
    ``take_along_axis(out, unsort_idx, axis=-2)`` on any per-ROI output
    restores proposal order."""
    b, n = branch.shape
    rb = roi_block
    n_prime = -(-n // rb) * rb + n_br * rb

    counts = jnp.stack(
        [jnp.sum(branch == br, axis=1) for br in range(n_br)], axis=1
    )  # [B, n_br]
    padded = -(-counts // rb) * rb
    seg_start = jnp.concatenate(
        [jnp.zeros((b, 1), counts.dtype), jnp.cumsum(padded, axis=1)[:, :-1]],
        axis=1,
    )  # [B, n_br]
    cum_counts = jnp.concatenate(
        [jnp.zeros((b, 1), counts.dtype), jnp.cumsum(counts, axis=1)[:, :-1]],
        axis=1,
    )
    order = jnp.argsort(branch, axis=1, stable=True)  # [B, N] sorted->orig
    sorted_branch = jnp.take_along_axis(branch, order, axis=1)
    rank = jnp.arange(n, dtype=counts.dtype)[None] - jnp.take_along_axis(
        cum_counts, sorted_branch, axis=1
    )
    new_pos = jnp.take_along_axis(seg_start, sorted_branch, axis=1) + rank
    bidx = jnp.arange(b)[:, None]

    boxes_s = jnp.zeros((b, n_prime, 4), boxes.dtype)
    boxes_s = boxes_s.at[bidx, new_pos].set(
        jnp.take_along_axis(boxes, order[..., None], axis=1)
    )
    gate_s = jnp.zeros((b, n_prime), gate.dtype)
    gate_s = gate_s.at[bidx, new_pos].set(
        jnp.take_along_axis(gate, order, axis=1)
    )
    # per-ROI branch derived block-wise so segment padding inherits the
    # segment's branch (keeps blocks pure AND avoids spurious tile re-DMAs)
    block_idx = jnp.arange(n_prime // rb, dtype=counts.dtype)[None]
    block_branch = jnp.zeros_like(block_idx) + sum(
        (block_idx >= (seg_start[:, br : br + 1] // rb)).astype(counts.dtype)
        for br in range(1, n_br)
    )
    branch_s = jnp.repeat(block_branch, rb, axis=1).astype(jnp.int32)
    # unsort: output row new_pos[i] holds sorted ROI i = original order[i]
    unsort_idx = jnp.zeros((b, n), jnp.int32)
    unsort_idx = unsort_idx.at[bidx, order].set(new_pos.astype(jnp.int32))
    return boxes_s, gate_s, branch_s, unsort_idx


class ROIPooler:
    def __init__(
        self,
        output_size: int,
        scales: Sequence[float],
        sampling_ratio: int = 0,
        pooler_type: str = "ROIPool",
        mrrp_on: bool = False,
        mrrp_num_branch: int = 1,
        canonical_box_size: float = 224.0,
        canonical_level: int = 4,
        roi_align_kernel: str = "gather",
        fc1_quant: str = "none",
    ):
        self.output_size = output_size
        self.scales = list(scales)
        self.sampling_ratio = sampling_ratio if sampling_ratio > 0 else 2
        self.pooler_type = pooler_type
        self.mrrp_on = mrrp_on
        self.mrrp_num_branch = mrrp_num_branch
        self.canonical_box_size = canonical_box_size
        self.canonical_level = canonical_level
        self.roi_align_kernel = roi_align_kernel
        self.fc1_quant = fc1_quant

    @property
    def triple(self) -> bool:
        return self.pooler_type == "ROILoopPool"

    @staticmethod
    def _on_tpu() -> bool:
        import jax

        try:
            return jax.default_backend() in ("tpu", "axon")
        except Exception:
            return False

    def fused_chunk_pool(
        self,
        features: List[jnp.ndarray],
        boxes: jnp.ndarray,  # [B, P, 4]
        objectness: jnp.ndarray,  # [B, P]
        valid: jnp.ndarray,  # [B, P]
        train: bool = False,
        level_ids: Optional[jnp.ndarray] = None,  # [B, P] (MRRP routing)
    ):
        """Fused pool+gate for the single-level shipped pooler types
        (``ROIPool`` — the flagship configs, ``ROILoopPool`` — MRRP,
        ``ROIAlignV2``): one image-batched Pallas kernel per channel chunk,
        with the WSOVOD objectness gate ``(objectness+1)*valid`` folded into
        the kernel output.

        Returns ``(chunks, unsort_idx)``: hwnc-layout
        ``[(3,) B, S, S, P', c_i]`` chunks (pair with DAN
        ``chunk_layout='hwnc'``; leading 3 for ROILoopPool's
        ROI/frame/context rows) meant to be streamed straight into the DAN's
        chunked fc1 (the ~1 GB/image pooled tensor never materializes), or
        ``(None, None)`` when this path doesn't apply.

        MRRP branch-concat features ([n_br*B, H, W, C], reference
        ``poolers.py:111-116``) route each ROI to its branch's feature copy
        INSIDE the kernel: ROIs are sorted by branch id into branch-pure
        8-ROI blocks (segments padded with gate-0 rows, P' >= P) and each
        block DMAs its resident tile from a per-block source table — one
        pooling pass instead of pool-all-branches-and-select. The rows come
        back branch-sorted; ``unsort_idx`` ([B, P], else None) gathers the
        DAN output back to proposal order (unsorting the [B, P, F] fc
        output costs ~1 ms; unsorting the pooled tensor would cost ~100x).

        Chunks are bf16/f32; with ``TPU.DAN_FC1_QUANT='int8'`` at inference
        the ROIPool/ROILoopPool kernels emit ``(chunk, per-ROI maxabs)``
        pairs (``quant='maxabs'``: cheap per-lane partials, reduced here) so
        the DAN's XLA quantize pass reads each chunk once instead of
        maxabs-reduce + re-read. The kernels' FULL int8 emission
        (``quant='int8'``) is deliberately NOT used — its per-region
        cross-lane maxabs reduce + scalar-broadcast epilogue serializes the
        VPU and measured ~50 ms SLOWER end-to-end than bf16 emission + XLA
        quantize at the COCO bench shape (v5e, see
        scripts/bench_maxpool_kernel.py extq)."""
        none = (None, None)
        # layout of the chunks this call returns (read by the ROI heads to
        # match the DAN's chunk_layout); the align kernel and the AD/train
        # paths are hwnc, inference pool paths switch to n56c below
        self.chunk_layout_used = "hwnc"
        # train-path fc1-output gate (see below); None = gate folded in-kernel
        self.train_row_gate = None
        if self.roi_align_kernel != "fused" or len(features) != 1:
            return none
        if self.pooler_type not in ("ROIPool", "ROILoopPool", "ROIAlignV2"):
            return none
        feat = features[0]
        mrrp = self.mrrp_on and feat.shape[0] != boxes.shape[0]
        if mrrp and self.pooler_type == "ROIAlignV2":
            return none  # no branched fused align kernel; per-branch fallback
        c = feat.shape[-1]
        if not self._on_tpu() or c % 128 != 0:
            return none

        gate_full = (
            (objectness + 1.0) * valid.astype(objectness.dtype)
        ).astype(jnp.float32)
        # Training pools UNGATED (gate = validity only) and the
        # (objectness+1) gate is applied to the fc1 OUTPUT instead
        # (ChunkedDenseGeneral row_gate — fc1 is linear, ReLU commutes with
        # nonneg scales): the gate gradient then comes from a cheap
        # [B, N, F] product and, with the frozen backbone every shipped
        # config uses, XLA drops the multi-GB pooled-tensor cotangent (the
        # fc1 dx GEMM + the pool VJP) from the backward entirely.
        self.train_row_gate = None
        if train:
            gate = valid.astype(jnp.float32)
            self.train_row_gate = gate_full
        else:
            gate = gate_full
        boxes = jnp.where(valid[..., None], boxes, 0.0).astype(jnp.float32)
        # chunk width = the kernel's native c_tile so downstream int8 scales
        # are per-(ROI, chunk); 512 measured fastest at C=2048 (loop pool:
        # 256, its two extra band buffers halve the VMEM budget).
        # WSOVOD_POOL_CT overrides both for on-hardware A/B (e.g. loop-pool
        # 512 at eval resolutions, where the resident tile is small).
        import os as _os

        _ct_env = _os.environ.get("WSOVOD_POOL_CT")
        if _ct_env:
            c_unit = int(_ct_env)
        else:
            c_unit = 256 if self.pooler_type == "ROILoopPool" else 512
        c_take = c_unit if c % c_unit == 0 else c

        b = boxes.shape[0]
        s = self.output_size

        def emit(make_chunk, n_rows, triple):
            shape = (3,) * int(triple) + (b, s, s, n_rows, c_take)
            if train and triple:
                # deferred: ChunkedDenseGeneral remats each pool->fc1 unit.
                # Only the triple (ROILoopPool) chunks need this — their
                # fc1-backward residuals are 3x and OOM a 16 GB chip at the
                # COCO budget; plain chunks fit and skip the recompute.
                return [
                    ChunkThunk(
                        functools.partial(make_chunk, cb), shape, feat.dtype
                    )
                    for cb in range(0, c, c_take)
                ]
            return [make_chunk(cb) for cb in range(0, c, c_take)]

        if self.pooler_type == "ROIAlignV2":
            from ..ops.pallas.roi_align_fused import roi_align_fused_ad

            def mk_align(cb):
                return roi_align_fused_ad(
                    feat, boxes, gate, cb, c_take, self.output_size,
                    self.scales[0], self.sampling_ratio, True,  # hwnc_out
                )

            return emit(mk_align, boxes.shape[1], False), None

        from ..ops.pallas.roi_pool_fused import (
            POOL_WIN_CLASSES,
            _branch_src_tbl,
            pool_width_classes,
            roi_pool_fused_ad,
            roi_pool_fused_batched,
            roi_pool_fused_branched_ad,
        )

        import os

        loop = self.pooler_type == "ROILoopPool"
        # maxabs-partial emission measured a net LOSS end-to-end on v5e
        # (2026-08-18 session): +9.5 ms in-kernel (92.0 -> 101.5 pool-only)
        # vs ~10 ms saved in the XLA quantize pass, bench 18.80 vs 19.19
        # img/s without. Default OFF; WSOVOD_POOL_MAXABS=1 re-enables for
        # A/B on other backends/shapes.
        use_maxabs = (
            (not train)
            and self.fc1_quant == "int8"
            and bool(os.environ.get("WSOVOD_POOL_MAXABS"))
        )
        # tile8 (A/B, WSOVOD_POOL_TILE8=1): pre-quantize the feature chunk
        # per image in XLA and run the WHOLE pool kernel in int8 — half the
        # stage-A walk bytes, 2x int8 MXU gathers, half the payload HBM
        # write, and NO separate fc1 quantize pass (the kernel's int8
        # payload + folded gate*scale feed the int8 GEMM directly).
        # Precision is per-(image, chunk) instead of per-(ROI, chunk) —
        # guarded by tests/test_golden_eval_int8.py + module agreement.
        use_tile8 = (
            (not train)
            and self.fc1_quant == "int8"
            and not loop
            and not mrrp
            and self.pooler_type == "ROIPool"
            and os.environ.get("WSOVOD_POOL_TILE8", "0") == "1"
        )
        if use_tile8:
            use_maxabs = False
        # Width-class-sorted blocks measured a DEAD END on v5e (2026-08-18
        # session): pool-only 300 ms vs 92 plain, bench 9.4 vs 18.8 img/s —
        # Mosaic keeps all three class bodies live per block instead of
        # branching. Default OFF; WSOVOD_POOL_CLS=1 re-enables for A/B on
        # other backends. Training keeps the per-ROI narrow/wide AD path.
        use_cls = (
            (not train)
            and not loop
            and bool(os.environ.get("WSOVOD_POOL_CLS"))
        )
        ncls = len(POOL_WIN_CLASSES)
        quant_kw = {"quant": "maxabs"} if use_maxabs else {}
        if use_tile8:
            quant_kw = {"quant": "tile8"}
        # n56c: the kernels' sublane-aligned per-ROI store layout
        # [(3,) B, N, p*8, c_i]. Measured SLOWER than hwnc on v5e
        # (202 vs 183 ms pool-only, both the 49-tail-pad and the free
        # ph*8+pw row mapping) — the hwnc masked-sublane store is not the
        # bottleneck the (DCE-contaminated) cheapstore ablation suggested.
        # Default OFF; WSOVOD_POOL_N56C=1 re-enables for A/B on other
        # toolchains. Inference only (the AD wrappers' custom VJPs are
        # hwnc); maxabs partials are hwnc-only in the consumer.
        use_n56c = (
            (not train)
            and not use_maxabs
            and os.environ.get("WSOVOD_POOL_N56C", "0") == "1"
        )
        self.chunk_layout_used = "n56c" if use_n56c else "hwnc"
        layout_kw = {"out_layout": "n56c"} if use_n56c else {}

        def post_tile8(r):
            # (payload int8, per-ROI scale [B, n_ct, N]) -> the
            # ChunkedDenseGeneral pre-quantized contract (scale [B, N];
            # every c-tile block holds the same folded gate*scale value)
            return (r[0], r[1][:, 0]) if use_tile8 else r

        if _ct_env and c_take % c_unit == 0:
            # force the kernel tile to the A/B chunk width too (its internal
            # heuristic would otherwise re-split a wider chunk)
            quant_kw["c_tile"] = c_unit

        def call_batched(boxes_k, gate_k, cb, **kw):
            r = roi_pool_fused_batched(
                feat, boxes_k, gate_k, cb, c_take=c_take,
                output_size=self.output_size, spatial_scale=self.scales[0],
                loop_pool=loop, context_ratio=1.8, **quant_kw, **layout_kw,
                **kw,
            )
            if use_maxabs:
                # [(3,) B, n_ct, N, CT] partials -> [(3,) B, N] maxabs
                return r[0], jnp.max(r[1], axis=(-3, -1))
            return post_tile8(r)

        # ---- ROILoopPool width-split hybrid (DEFAULT ON; WSOVOD_LOOP_SPLIT=0
        # disables). The loop program's per-ROI narrow/wide pl.when pair
        # taxes the whole sweep ~2x (2570 ms two-body vs 1318 force-narrow,
        # all-narrow dist, measured 2026-08-20 v5e): split into a
        # force-narrow head and a capacity-bounded wide-only tail — each a
        # SINGLE-body program. Tail capacity WSOVOD_LOOP_WIDE_FRAC (default
        # 0.25; honest SAM mix is ~20% wide); see the sort-key comment below
        # for how spare capacity / overflow distribute. Composes with MRRP
        # branch sorting (each segment branch-partitioned separately).
        use_loop_split = (
            loop
            and boxes.shape[1]
            >= int(os.environ.get("WSOVOD_LOOP_SPLIT_MIN", "256"))
            and not use_cls
            and os.environ.get("WSOVOD_LOOP_SPLIT", "1") == "1"
        )
        if use_loop_split:
            from ..ops.pallas.roi_pool_fused import LOOP_WIN

            n_rois = boxes.shape[1]
            s_sc = self.scales[0]
            img_w = feat.shape[2] / s_sc
            x1, x2 = boxes[..., 0], boxes[..., 2]
            out_dw = (x2 - x1) * ((1.8 - 1.0) * 0.5)

            def cells(a, bb):
                ra = jnp.floor(a * s_sc + 0.5).astype(jnp.int32)
                rb = jnp.floor(bb * s_sc + 0.5).astype(jnp.int32)
                return rb - ra + 1

            # same rounding/clipping as the kernel meta (_pack_loop_meta)
            rw_o = cells(
                jnp.clip(x1 - out_dw, 0.0, img_w),
                jnp.clip(x2 + out_dw, 0.0, img_w),
            )
            rw_r = cells(x1, x2)
            frac = float(os.environ.get("WSOVOD_LOOP_WIDE_FRAC", "0.25"))
            k_cap = min(n_rois - 8, max(8, int(round(frac * n_rois / 8)) * 8))
            # Tiered sort key (ascending; segments slice the sorted order):
            # tier0 win48-able (rw_o <= 41 AND rw_r <= 49), tallest first
            # so overflow spills the SHORTEST boxes into the win96 segment
            # (cheap, still exact); tier1 win96-narrow by distance past the
            # win48 limits, so tier0 underflow pulls in the closest-to-
            # win48 boxes (smallest clipped-window error); tier2 gate-0 pad
            # rows (zeroed boxes pool nothing — free tail filler); tier3
            # wides by distance past the win96 limits (on tail overflow
            # only the narrowest wides spill into the win96 segment). Cost
            # model: a walk costs rows x window cells, so win48 halves the
            # narrow walk bytes and spare tail capacity should hold the
            # cheapest rows.
            y1, y2 = boxes[..., 1], boxes[..., 3]
            img_h = feat.shape[1] / s_sc
            out_dh = (y2 - y1) * ((1.8 - 1.0) * 0.5)
            rh_o = cells(
                jnp.clip(y1 - out_dh, 0.0, img_h),
                jnp.clip(y2 + out_dh, 0.0, img_h),
            )
            rh_r = cells(y1, y2)
            wide_key = jnp.maximum(rw_o - (LOOP_WIN - 7), rw_r - 7 * 15)
            key48 = jnp.maximum(rw_o - 41, rw_r - 49)
            sort_key = jnp.where(
                gate <= 0,
                jnp.int32(1 << 10),
                jnp.where(
                    wide_key > 0,
                    (1 << 11) + jnp.minimum(wide_key, 1 << 10),
                    jnp.where(
                        key48 > 0,
                        jnp.minimum(key48, 1 << 9),
                        -(1 << 12) - jnp.minimum(rh_o + rh_r, 1 << 11),
                    ),
                ),
            )
            order = jnp.argsort(sort_key, axis=1, stable=True).astype(
                jnp.int32
            )
            u1 = jnp.argsort(order, axis=1).astype(jnp.int32)
            boxes_w = jnp.take_along_axis(boxes, order[..., None], axis=1)
            gate_w = jnp.take_along_axis(gate, order, axis=1)
            # wide-tail body: "vpu" masked band max (exact for ANY box)
            # also measured FASTER than the jc_wide dots body as the
            # single-body wide program (mixed split 1914 vs 2054 ms,
            # 2026-08-20 v5e — no narrow ROIs left to tax here, and the
            # tall dots set loses to the plain walk)
            wide_body = os.environ.get("WSOVOD_LOOP_SPLIT_WIDE", "vpu")
            # 3-segment default: win48 head + win96 mid + wide tail
            # (WSOVOD_LOOP_3SEG=0 restores the 2-segment win96+wide form)
            if os.environ.get("WSOVOD_LOOP_3SEG", "1") == "1":
                f_mid = float(os.environ.get("WSOVOD_LOOP_MID_FRAC", "0.30"))
                k_mid = min(
                    n_rois - k_cap - 8,
                    max(8, int(round(f_mid * n_rois / 8)) * 8),
                )
                k1 = n_rois - k_mid - k_cap
                seg_kws = (
                    (slice(0, k1), dict(win=48, force_narrow=True)),
                    (
                        slice(k1, k1 + k_mid),
                        dict(win=LOOP_WIN, force_narrow=True),
                    ),
                    (
                        slice(k1 + k_mid, None),
                        dict(win=1 << 20, loop_wide=wide_body),
                    ),
                )
            else:
                k_split = n_rois - k_cap
                seg_kws = (
                    (slice(0, k_split), dict(win=LOOP_WIN, force_narrow=True)),
                    (
                        slice(k_split, None),
                        dict(win=1 << 20, loop_wide=wide_body),
                    ),
                )
            segs, unsorts, offs, off = [], [], [], 0
            for sl, kw_sl in seg_kws:
                bx, gt = boxes_w[:, sl], gate_w[:, sl]
                if mrrp:
                    n_br = feat.shape[0] // b
                    branch = (
                        (level_ids // 1000) % n_br
                        if level_ids is not None
                        else jnp.zeros(boxes.shape[:2], jnp.int32)
                    )
                    br = jnp.take_along_axis(branch, order, axis=1)[:, sl]
                    bx, gt, br_s, un2 = branch_partition(bx, gt, br, n_br)

                    def mk_seg(cb, bx=bx, gt=gt, br_s=br_s, kw_sl=kw_sl):
                        if use_maxabs or not train:
                            return call_batched(
                                bx, gt, cb,
                                src_tbl=_branch_src_tbl(br_s, b, 8), **kw_sl
                            )
                        return roi_pool_fused_branched_ad(
                            feat, bx, gt, br_s.astype(jnp.float32), cb,
                            c_take, self.output_size, self.scales[0], loop,
                            1.8, kw_sl.get("win"),
                            kw_sl.get("force_narrow", False),
                            kw_sl.get("loop_wide"),
                        )
                else:
                    un2 = None

                    def mk_seg(cb, bx=bx, gt=gt, kw_sl=kw_sl):
                        if use_maxabs or not train:
                            return call_batched(bx, gt, cb, **kw_sl)
                        return roi_pool_fused_ad(
                            feat, bx, gt, cb, c_take, self.output_size,
                            self.scales[0], loop, 1.8, kw_sl.get("win"),
                            kw_sl.get("force_narrow", False),
                            kw_sl.get("loop_wide"),
                        )

                segs.append(emit(mk_seg, bx.shape[1], loop))
                unsorts.append(un2)
                offs.append(off)
                off += bx.shape[1]

            if unsorts[0] is not None:
                # width-position -> final row (per-segment branch position
                # plus the segment's start offset), then orig -> final
                pos = jnp.concatenate(
                    [un + o for un, o in zip(unsorts, offs)], axis=1
                )
                unsort_idx = jnp.take_along_axis(pos, u1, axis=1)
            else:
                unsort_idx = u1
            if self.train_row_gate is not None:
                bidx = jnp.arange(b)[:, None]
                self.train_row_gate = (
                    jnp.zeros((b, off), jnp.float32)
                    .at[bidx, unsort_idx]
                    .set(gate_full)
                )
            return (
                SegmentedChunks(segs, sizes=[o2 - o1 for o1, o2 in
                                             zip(offs, offs[1:] + [off])]),
                unsort_idx,
            )

        if mrrp:
            n_br = feat.shape[0] // b
            branch = (
                (level_ids // 1000) % n_br
                if level_ids is not None
                else jnp.zeros(boxes.shape[:2], jnp.int32)
            )
            if use_cls:
                cls = pool_width_classes(boxes, self.scales[0], feat.shape[2])
                key, n_keys = branch * ncls + cls, n_br * ncls
            else:
                key, n_keys = branch, n_br
            boxes_s, gate_s, key_s, unsort_idx = branch_partition(
                boxes, gate, key, n_keys
            )
            branch_s = key_s // ncls if use_cls else key_s
            if self.train_row_gate is not None:
                # fc1-output gate in SORTED row order (applied before unsort)
                bidx = jnp.arange(b)[:, None]
                self.train_row_gate = (
                    jnp.zeros(gate_s.shape, jnp.float32)
                    .at[bidx, unsort_idx]
                    .set(gate_full)
                )

            def mk_branched(cb):
                if use_maxabs or use_cls or not train:
                    kw = {"src_tbl": _branch_src_tbl(branch_s, b, 8)}
                    if use_cls:
                        kw["cls_tbl"] = (key_s % ncls)[:, ::8]
                    return call_batched(boxes_s, gate_s, cb, **kw)
                return roi_pool_fused_branched_ad(
                    feat, boxes_s, gate_s, branch_s.astype(jnp.float32), cb,
                    c_take, self.output_size, self.scales[0], loop, 1.8,
                )

            return emit(mk_branched, boxes_s.shape[1], loop), unsort_idx

        if use_cls:
            cls = pool_width_classes(boxes, self.scales[0], feat.shape[2])
            boxes_s, gate_s, key_s, unsort_idx = branch_partition(
                boxes, gate, cls, ncls
            )
            cls_tbl = key_s[:, ::8]

            def mk_plain_sorted(cb):
                return call_batched(boxes_s, gate_s, cb, cls_tbl=cls_tbl)

            return emit(mk_plain_sorted, boxes_s.shape[1], loop), unsort_idx

        # width-split plain pooling (inference): ROIs sorted by feature-grid
        # width and split at a static 8-aligned boundary; the narrow segment
        # pools with a 24-px x-window, the rest with the default 48. ROIs
        # wider than a segment's window still take the kernel's exact
        # full-row fallback, so the static split fraction only affects
        # speed, never correctness. Measured a WASH end-to-end on v5e
        # (15.50 vs 15.54 img/s mixed-dist; win24 vs win48 pool-only 176 vs
        # 183 — the kernel cost is per-ROI stage-B/store dominated, not
        # band-width) — default OFF; WSOVOD_POOL_WSPLIT=1 re-enables.
        # hpyr (DEFAULT ON; WSOVOD_POOL_HPYR=0 disables): width-sort, then
        # pool the WIDE
        # tail segment with the full-row force program + the shared
        # H-direction 4-row pyramid (fewer stage-A bytes for the tall
        # walks that dominate the honest mix's wide 20%); the narrow
        # segment keeps the default two-body win-48 program, so ROIs
        # mis-split into it stay exact.
        n_rois = boxes.shape[1]
        use_hpyr = (
            (not train)
            and not loop
            and self.pooler_type == "ROIPool"
            and not use_maxabs
            and not mrrp
            and n_rois >= 256
            and os.environ.get("WSOVOD_POOL_HPYR", "1") == "1"
        )
        use_wsplit = (
            (not train)
            and not loop
            and self.pooler_type == "ROIPool"
            and not use_maxabs
            and not mrrp
            and n_rois >= 256
            and os.environ.get("WSOVOD_POOL_WSPLIT", "0") == "1"
        )
        if use_wsplit or use_hpyr:
            frac = float(
                os.environ.get(
                    "WSOVOD_POOL_WSPLIT_FRAC", "0.78" if use_hpyr else "0.4"
                )
            )
            k_split = max(8, int(round(frac * n_rois / 8)) * 8)
            if k_split < n_rois:
                s_sc = self.scales[0]
                rx1 = jnp.floor(boxes[..., 0] * s_sc + 0.5).astype(jnp.int32)
                rx2 = jnp.floor(boxes[..., 2] * s_sc + 0.5).astype(jnp.int32)
                rw = jnp.maximum(rx2 - rx1 + 1, 1)
                # push gate-0 (invalid/pad) rows to the narrow segment: their
                # zeroed boxes pool nothing either way
                order = jnp.argsort(
                    jnp.where(gate > 0, rw, -1), axis=1
                ).astype(jnp.int32)
                unsort_idx = jnp.argsort(order, axis=1).astype(jnp.int32)
                boxes_w = jnp.take_along_axis(boxes, order[..., None], axis=1)
                gate_w = jnp.take_along_axis(gate, order, axis=1)
                if use_hpyr:
                    # wide tail: full-row force + H-pyramid stage A +
                    # j_cap gather-dot stage B (596.7 vs 635.8 ms all-wide
                    # for the W-pyramid form, measured 2026-08-20 v5e)
                    seg_kws = (
                        (slice(0, k_split), k_split, dict(win=48)),
                        (
                            slice(k_split, None),
                            n_rois - k_split,
                            dict(
                                win=1 << 20,
                                force_narrow=True,
                                hpyr=True,
                                stage_b_wide="vpu",
                            ),
                        ),
                    )
                else:
                    seg_kws = (
                        (slice(0, k_split), k_split, dict(win=24)),
                        (slice(k_split, None), n_rois - k_split, dict(win=48)),
                    )
                segs = []
                for sl, n_sl, kw_sl in seg_kws:
                    def mk_seg(cb, sl=sl, kw_sl=kw_sl):
                        return call_batched(
                            boxes_w[:, sl], gate_w[:, sl], cb, **kw_sl
                        )

                    segs.append(emit(mk_seg, n_sl, False))
                return (
                    SegmentedChunks(segs, sizes=[k for _, k, _ in seg_kws]),
                    unsort_idx,
                )

        # full-row single-body program (A/B, WSOVOD_POOL_FULLROW=1): every
        # ROI takes the force_narrow full-row path — exact for image-clipped
        # boxes (all shipped callers clip), ONE traced body instead of the
        # per-ROI narrow/wide pl.when pair, and pipe-able
        # (WSOVOD_POOL_PIPE=1 interleaves A(i+1) with B(i)/store(i)).
        use_fullrow = (
            (not train)
            and not loop
            and self.pooler_type == "ROIPool"
            and not use_maxabs
            and not mrrp
            and os.environ.get("WSOVOD_POOL_FULLROW", "0") == "1"
        )

        def mk_plain(cb):
            if use_fullrow:
                return call_batched(
                    boxes, gate, cb, win=1 << 20, force_narrow=True
                )
            if use_maxabs or use_tile8 or not train:
                return call_batched(boxes, gate, cb)
            return roi_pool_fused_ad(
                feat, boxes, gate, cb, c_take, self.output_size,
                self.scales[0], loop, 1.8,
            )

        return emit(mk_plain, boxes.shape[1], loop), None

    def _pool_one_level(self, feat, boxes, scale):
        """feat [H, W, C], boxes [P, 4] -> [P, S, S, C] or [3, P, S, S, C]."""
        if self.pooler_type in ("ROIPool",):
            if self._on_tpu() and feat.shape[-1] % 128 == 0:
                from ..ops.pallas.roi_pool_kernel import roi_pool_pallas

                return roi_pool_pallas(feat, boxes, self.output_size, scale)
            return roi_pool(feat, boxes, self.output_size, scale)
        if self.pooler_type == "ROILoopPool":
            if self._on_tpu() and feat.shape[-1] % 128 == 0:
                from ..ops.pallas.roi_pool_kernel import roi_loop_pool_pallas

                return roi_loop_pool_pallas(feat, boxes, self.output_size, scale)
            return roi_loop_pool(feat, boxes, self.output_size, scale)
        if self.pooler_type in ("ROIAlign", "ROIAlignV2"):
            if (
                self.roi_align_kernel in ("fused", "pallas", "pallas_approx")
                and self._on_tpu()
                and feat.shape[-1] % 128 == 0
                and self.pooler_type == "ROIAlignV2"
            ):
                from ..ops.pallas.roi_align_kernel import (
                    roi_align_pallas,
                    roi_align_pallas_exact_ad,
                )

                # "fused" normally routes through fused_chunk_pool; paths it
                # doesn't cover (MRRP, multi-level) fall back to the exact
                # per-image kernel here
                if self.roi_align_kernel in ("fused", "pallas"):
                    # exact multi-pass (size-bucketed windows): bit-accurate
                    # vs the gather path and ~2x faster on v5e; differentiable
                    # via a gather-path VJP fallback
                    return roi_align_pallas_exact_ad(
                        feat, boxes, self.output_size, scale,
                        sampling_ratio=self.sampling_ratio,
                    )
                return roi_align_pallas(
                    feat, boxes, self.output_size, scale,
                    sampling_ratio=self.sampling_ratio,
                )
            return roi_align(
                feat,
                boxes,
                self.output_size,
                scale,
                sampling_ratio=self.sampling_ratio,
                aligned=self.pooler_type == "ROIAlignV2",
            )
        raise ValueError(f"Unsupported pooler type {self.pooler_type}")

    def __call__(
        self,
        features: List[jnp.ndarray],  # per level [B(*br), H, W, C]
        boxes: jnp.ndarray,  # [B, P, 4]
        valid: jnp.ndarray,  # [B, P]
        level_ids: Optional[jnp.ndarray] = None,  # [B, P] (MRRP branch routing)
        mask_invalid: bool = True,
    ) -> jnp.ndarray:
        """Returns [B, P, S, S, C] (or [3, B, P, S, S, C] for ROILoopPool).

        ``mask_invalid=False`` skips the full-tensor zeroing pass for callers
        that immediately multiply by a validity-carrying gate anyway."""
        self._skip_mask = not mask_invalid
        n_levels = len(features)
        b = boxes.shape[0]

        boxes = jnp.where(valid[..., None], boxes, 0.0)

        if self.mrrp_on and features[0].shape[0] != b:
            n_br = features[0].shape[0] // b
            # branch-concat layout [n_br*B, H, W, C] -> route ROIs by branch id
            assert n_levels == 1, "MRRP pooling implemented for single level"
            feat = features[0]
            branch = (
                (level_ids // 1000) % n_br
                if level_ids is not None
                else jnp.zeros(boxes.shape[:2], jnp.int32)
            )

            def per_image(img_idx):
                def pool_branch(br):
                    return self._pool_one_level(
                        feat[br * b + img_idx], boxes[img_idx], self.scales[0]
                    )

                pooled_all = jnp.stack([pool_branch(br) for br in range(n_br)])
                # select each ROI's branch: pooled_all [n_br, (3,) P, S, S, C]
                sel = branch[img_idx]  # [P]
                if self.triple:
                    return jnp.take_along_axis(
                        pooled_all,
                        sel[None, None, :, None, None, None],
                        axis=0,
                    )[0]
                return jnp.take_along_axis(
                    pooled_all, sel[None, :, None, None, None], axis=0
                )[0]

            pooled = [per_image(i) for i in range(b)]
            out = jnp.stack(pooled, axis=1 if self.triple else 0)
            return self._mask_invalid(out, valid)

        if n_levels == 1:
            pool = lambda f, bx: self._pool_one_level(f, bx, self.scales[0])
            # static batch loop, not vmap: batched gathers lower ~1.6x slower
            # on TPU and pallas_call + scalar prefetch does not batch at all.
            # (XLA may merge roi_align's per-sample gathers into one
            # [N, P*S, P*S, C] temp per image — acceptable at resolution 7.)
            pooled = [pool(features[0][i], boxes[i]) for i in range(b)]
            out = jnp.stack(pooled, axis=1 if self.triple else 0)
            return self._mask_invalid(out, valid)

        # multi-level: pool every level, select by assigned level
        lvl = assign_boxes_to_levels(
            boxes,
            min_level=int(-jnp.log2(self.scales[0])),
            max_level=int(-jnp.log2(self.scales[-1])),
            canonical_box_size=self.canonical_box_size,
            canonical_level=self.canonical_level,
        )
        pooled_levels = []
        for f, s in zip(features, self.scales):
            pool = lambda ff, bx: self._pool_one_level(ff, bx, s)
            pooled_levels.append(
                jax.vmap(pool, in_axes=(0, 0), out_axes=1 if self.triple else 0)(f, boxes)
            )
        stacked = jnp.stack(pooled_levels)  # [L, (3,) B, P, S, S, C]
        if self.triple:
            sel = lvl[None, None, :, :, None, None, None]
            out = jnp.take_along_axis(stacked, sel, axis=0)[0]
        else:
            sel = lvl[None, :, :, None, None, None]
            out = jnp.take_along_axis(stacked, sel, axis=0)[0]
        return self._mask_invalid(out, valid)

    def _mask_invalid(self, out: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
        if getattr(self, "_skip_mask", False):
            return out
        if self.triple:
            return out * valid[None, :, :, None, None, None].astype(out.dtype)
        return out * valid[:, :, None, None, None].astype(out.dtype)


def build_pooler(cfg, strides: Sequence[int]) -> ROIPooler:
    return ROIPooler(
        output_size=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
        scales=[1.0 / s for s in strides],
        sampling_ratio=cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO,
        pooler_type=cfg.MODEL.ROI_BOX_HEAD.POOLER_TYPE,
        mrrp_on=cfg.MODEL.MRRP.MRRP_ON,
        mrrp_num_branch=cfg.MODEL.MRRP.NUM_BRANCH,
        roi_align_kernel=cfg.TPU.ROI_ALIGN_KERNEL,
        fc1_quant=cfg.TPU.DAN_FC1_QUANT,
    )
