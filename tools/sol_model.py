"""Speed-of-light model for the flagship forward (the VERDICT-r2 #4 floor).

Answers "how fast CAN this forward go on this chip" with arithmetic, not
vibes, so the measured number can be judged against a floor with the same
rigor as the windowed-gather negative result:

  * per-stage BYTE accounting — both the algorithmic floor (read every
    input once, write every output once) and what the current
    implementation actually moves — computed from the REAL projection
    tables (capped dense + COO tail sizes, lane padding) and the REAL
    decoder shapes (captured by shape-recording wrappers under
    jax.eval_shape, so the table can never drift from the model);
  * model FLOPs from XLA cost analysis (compiled at batch 1, scaled —
    FLOPs are linear in batch);
  * floors at the chip's CALIBRATED rates: the 168 TFLOP/s chained-matmul
    MXU calibration (PERF_NOTES.md) and a streaming-HBM calibration this
    tool measures on the real chip (``--calibrate``: saxpy over ~2 GB,
    device-time protocol).  Gathers additionally get the MEASURED
    random-row gather bandwidth (``--calibrate`` too) because random
    access has its own ceiling below streaming HBM.

CPU-safe by default (the accounting and cost analysis need no TPU);
``--calibrate`` requires the chip and prints the two bandwidth lines to
paste into the table header.

Reference scope note: the upstream repo has no performance model at all
(SURVEY.md §6); this is part of the TPU rebuild's perf-first story.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from omnifusion_tpu.cli.common import apply_runtime_env  # noqa: E402

MXU_TFLOPS = 168.0  # chained-matmul calibration, PERF_NOTES.md
# Measured on-chip 2026-08-19 (measurements.log, xtra_sol_calibrate):
# 16x saxpy over 1 GiB, chained-scan device-time protocol.
DEFAULT_STREAM_GBS = 409.9
# Random row-gather cost by row width, ns per index (same run).  The
# gather is PER-INDEX bound: ~9.5 ns of issue cost per index plus a
# ~105 GB/s marginal byte rate — far below streaming HBM, which is why
# the round-3 byte-rate floor (260 GB/s) was not a real floor.
# 4096/8192 B rows measured 2026-08-19 13:03 (xtd5_cal_gather_wide) — the
# b=256 regime; linear extrapolation from the 1024/2048 segment predicted
# 50.7/93.9, confirming the per-index model holds at wide rows.
GATHER_NS_BY_ROW_BYTES = (
    (256, 11.98), (512, 13.97), (1024, 18.27), (2048, 29.07),
    (4096, 50.55), (8192, 93.03),
)


def gather_ns_per_index(row_bytes: float) -> float:
    """Piecewise-linear interpolation of the calibrated ns/index table
    (nearest-segment slope outside it)."""
    pts = GATHER_NS_BY_ROW_BYTES
    if row_bytes <= pts[0][0]:
        (x0, y0), (x1, y1) = pts[0], pts[1]
    elif row_bytes >= pts[-1][0]:
        (x0, y0), (x1, y1) = pts[-2], pts[-1]
    else:
        for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
            if x0 <= row_bytes <= x1:
                break
    t = y0 + (row_bytes - x0) * (y1 - y0) / (x1 - x0)
    return max(t, 1.0)


def _pad(n, m):
    return -(-n // m) * m


def calibrate(phase: str = "all"):
    """phase: "stream" | "gather" (random width sweep) | "order" (sorted/
    sequential) | "all".  Split so each phase fits one measurement-queue
    cap — the combined run TIMED OUT at 500 s on 2026-08-19 (each probe
    compiles its own jit; the compiles, not the kernels, blew the budget).
    """
    apply_runtime_env()
    import jax
    import jax.numpy as jnp
    import numpy as np

    # Repo benchmarking protocol: iterations chained in ONE jit with a data
    # dependency (so the runtime can't elide repeats), distinct scalar input
    # per timed call, best-of-N to shed tunnel-dispatch outliers, and scans
    # long enough that kernel time dominates dispatch (ADVICE r3).
    REPS, BEST_OF = 16, 3

    if phase in ("stream", "all"):
        n = 1 << 28  # 1 GiB f32
        x = jnp.asarray(np.random.default_rng(0).random(n, np.float32))

        @jax.jit
        def stream(x, s):
            def step(v, _):
                return v * s + jnp.float32(1.0), v[0]

            v, outs = jax.lax.scan(step, x, None, length=REPS)
            return outs.sum() + v[1]

        float(stream(x, jnp.float32(1.0)))  # compile+warm
        dts = []
        for i in range(BEST_OF):
            t0 = time.perf_counter()
            float(stream(x, jnp.float32(1.0 + 1e-7 * (i + 1))))
            dts.append(time.perf_counter() - t0)
        dt = min(dts)
        gbs = REPS * (2 * x.nbytes) / dt / 1e9  # read + write per scan step
        print(f"stream: {gbs:.1f} GB/s  ({dt*1e3:.1f} ms for {REPS}x saxpy over 1 GiB)")
        del x

    # --- gather structure sweep: per-index vs per-byte, and does index
    # ORDER matter?  (informs whether the merge gather is at the hardware
    # floor or a sorted/two-phase formulation could beat it)
    def probe(tag, rows_p, width_p, order):
        srcp = jnp.asarray(
            np.random.default_rng(3).random((rows_p, width_p), np.float32).astype(np.float16)
        )
        r = np.random.default_rng(4)
        if order == "random":
            ix = r.integers(0, rows_p - 1, rows_p, np.int32)
        elif order == "sorted":
            ix = np.sort(r.integers(0, rows_p - 1, rows_p, np.int32))
        else:  # sequential
            ix = np.arange(rows_p, dtype=np.int32) % (rows_p - 1)
        ixp = jnp.asarray(ix)

        @jax.jit
        def g(srcp, ixp, s):
            def step(acc, t):
                fetched = jnp.take(srcp, ixp + t % 2, axis=0)
                return acc + fetched.astype(jnp.float32).sum() * s, ()

            acc, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(REPS), length=REPS)
            return acc

        float(g(srcp, ixp, jnp.float32(0.0)))
        best = None
        for i in range(BEST_OF):
            t0 = time.perf_counter()
            float(g(srcp, ixp, jnp.float32(1e-30 * (i + 1))))
            best = min(best or 1e9, time.perf_counter() - t0)
        useful = REPS * srcp.nbytes
        print(
            f"gather[{tag:22s}] {useful / best / 1e9:7.1f} GB/s "
            f"({best / REPS / rows_p * 1e9:6.2f} ns/index, rows={rows_p}, "
            f"row={width_p * 2} B, {order})"
        )

    if phase in ("gather", "all"):
        for width_p, rows_p in ((128, 1 << 22), (256, 1 << 21), (512, 1 << 20), (1024, 1 << 19)):
            probe(f"w{width_p * 2}B/random", rows_p, width_p, "random")
    if phase in ("gather_wide", "all"):
        # the b=256 headline gathers 4096 B rows — pin the wide-row regime
        # instead of extrapolating the 256-2048 B table
        for width_p, rows_p in ((2048, 1 << 18), (4096, 1 << 17)):
            probe(f"w{width_p * 2}B/random", rows_p, width_p, "random")
    if phase in ("order", "all"):
        probe("w1024B/random", 1 << 20, 512, "random")  # same-shape baseline
        probe("w1024B/sorted", 1 << 20, 512, "sorted")
        probe("w1024B/sequential", 1 << 20, 512, "sequential")


def account(batch: int, stream_gbs: float, train: bool = False,
            model_kind: str = "oneshot"):
    apply_runtime_env()
    import jax

    try:  # accounting never needs the chip; after --calibrate the TPU
        jax.config.update("jax_platforms", "cpu")  # backend is already live
    except RuntimeError:  # and the update may be rejected — any backend works
        pass
    import jax.numpy as jnp
    import numpy as np

    import omnifusion_tpu.models.spherical_fusion as sf
    from omnifusion_tpu.projection import ProjectionSpec
    from omnifusion_tpu.projection.spec import (
        build_equi2pers_grids,
        build_pers2equi_grids,
    )

    spec = ProjectionSpec.create((512, 1024), (128, 128), (80, 80), nrows=4)
    g_e2p = build_equi2pers_grids(spec)
    g_p2e = build_pers2equi_grids(spec)
    # iterative (train_erp_depth_iterative.py): the trunk runs `iters` times
    # sharing weights; each refinement re-projects the previous ERP depth at
    # quarter patch resolution and every pass ends in a confidence merge.
    iters = 2 if model_kind == "iterative" else 1
    spec_q = spec.with_patch_scale(4)
    g_e2p_q = build_equi2pers_grids(spec_q) if iters > 1 else None

    B, H, W = batch, spec.erp_h, spec.erp_w
    P, h, w = spec.n_patches, spec.patch_h, spec.patch_w
    n_erp, n_pp = H * W, P * h * w

    # --- capture decoder resize + every conv's shapes under eval_shape ---
    resizes = []
    convs = []
    orig_resize = sf.resize_bilinear
    orig_conv = jax.lax.conv_general_dilated

    def rec_resize(x, size, impl="xla"):
        out = orig_resize(x, size, impl="xla")
        resizes.append((tuple(x.shape), tuple(out.shape), x.dtype))
        return out

    def rec_conv(lhs, rhs, *a, **kw):
        out = orig_conv(lhs, rhs, *a, **kw)
        convs.append((tuple(lhs.shape), tuple(rhs.shape), tuple(out.shape), lhs.dtype))
        return out

    sf.resize_bilinear = rec_resize
    jax.lax.conv_general_dilated = rec_conv
    try:
        if model_kind == "iterative":
            from omnifusion_tpu.models import SphericalFusionIterative

            model = SphericalFusionIterative(
                spec=spec, num_iters=iters, dtype=jnp.bfloat16, merge_dtype=jnp.float16
            )
        else:
            model = sf.SphericalFusion(spec=spec, dtype=jnp.bfloat16, merge_dtype=jnp.float16)
        rgb = jax.ShapeDtypeStruct((B, H, W, 3), jnp.float32)
        var_shapes = jax.eval_shape(lambda r: model.init(jax.random.PRNGKey(0), r), rgb)
        resizes.clear()  # init traces the forward too — count apply's only
        convs.clear()
        jax.eval_shape(
            lambda v, r: model.apply(v, r, train=False), var_shapes, rgb
        )
    finally:
        sf.resize_bilinear = orig_resize
        jax.lax.conv_general_dilated = orig_conv

    # --- FLOPs: XLA cost analysis at batch 1, scaled (linear in batch) ---
    rgb1 = jnp.zeros((1, H, W, 3), jnp.float32)
    v1 = jax.jit(lambda: model.init(jax.random.PRNGKey(0), rgb1))()
    comp = jax.jit(lambda v, r: model.apply(v, r, train=False)).lower(v1, rgb1).compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca["flops"]) * B

    # rows: (stage, floor_bytes, stream_bytes, n_gather_idx, gather_row_bytes)
    # impl time = stream_bytes/stream_rate + n_idx * gather_ns(row_bytes).
    # The gather term uses the CALIBRATED per-index cost table (2026-08-19,
    # measurements.log) — the round-3 byte-rate gather model (260 GB/s) was
    # falsified on-chip: the projection gathers are per-index-bound.
    rows = []

    # equi2pers: bf16 source (model casts before the projection); one live
    # quad per output pixel (pure resampling), so the capped index count IS
    # the index floor.
    d = B * 3
    d_pad = _pad(d, 64)  # ops/sparse_blend._pad_leading pads to 64 elements
    n_out_pad = _pad(n_pp, 256)
    e2p_floor = (B * 3 * n_erp + B * 3 * n_pp) * 2
    e2p_stream = (
        B * 3 * n_erp * 2  # pack reads the source
        + n_erp * 4 * d_pad * 2  # pack writes 4 corner blocks, lane-padded
        + n_out_pad * d_pad * 2  # kernel writes (N, D)
        + 2 * n_out_pad * d_pad * 2  # channel-last transpose read+write
    )
    rows.append(("equi2pers", e2p_floor, e2p_stream, n_out_pad, 4 * d_pad * 2))

    # merge: f16 gather, f32 kernel output, capped dense + COO tail
    idx_c, w_c, tail_pix, tail_idx, tail_w = g_p2e.capped
    cap, m_tail = idx_c.shape[1], int(np.asarray(tail_pix).shape[0])
    live_dense = int(np.count_nonzero(np.abs(np.asarray(w_c)).sum(-1)))
    d = B * 2
    d_pad = _pad(d, 64)  # see _pad_leading
    n_out_pad = _pad(n_erp, 256)
    mrg_floor = B * 2 * n_pp * 2 + B * n_erp * 4
    mrg_stream = (
        B * 2 * n_pp * 2  # pack reads pred*conf / conf planes
        + n_pp * 4 * d_pad * 2  # pack writes quad blocks
        + n_out_pad * cap * 4 * 4  # f32 weights
        + n_out_pad * d_pad * 4  # kernel writes f32
        + 3 * B * n_erp * 4  # num/den read + depth write (f32 division)
    )
    mrg_idx = cap * n_out_pad + m_tail
    mrg_tag = f" x{iters}" if iters > 1 else ""
    rows.append(
        (f"merge (cap={cap}, tail={m_tail}){mrg_tag}",
         iters * mrg_floor, iters * mrg_stream, iters * mrg_idx, 4 * d_pad * 2)
    )
    if iters > 1:
        # refinement passes re-project the previous ERP depth (1 channel) at
        # quarter patch resolution (iterative.py:90)
        n_pp_q = P * spec_q.patch_h * spec_q.patch_w
        d_q = B * 1
        d_q_pad = _pad(d_q, 64)
        n_q_pad = _pad(n_pp_q, 256)
        q_floor = (B * n_erp + B * n_pp_q) * 2
        q_stream = (
            B * n_erp * 2
            + n_erp * 4 * d_q_pad * 2
            + n_q_pad * d_q_pad * 2
            + 2 * n_q_pad * d_q_pad * 2
        )
        rows.append((f"e2p quarter depth x{iters - 1}",
                     (iters - 1) * q_floor, (iters - 1) * q_stream,
                     (iters - 1) * n_q_pad, 4 * d_q_pad * 2))
    # index floor: ANY gather formulation must issue >= one index per live
    # quad (the windowed-gather negative result, PERF_NOTES) at unpadded
    # 4*D row bytes — the headroom between this and the impl row is the
    # dense-slot dead fraction plus lane padding, nothing else.
    live_quads = live_dense + m_tail
    idx_floor_ms = iters * live_quads * gather_ns_per_index(4 * d * 2) / 1e6

    # decoder resizes: floor = in+out once; XLA's separable 2-pass writes
    # and re-reads the half-resized intermediate
    rs_floor = rs_xla = 0
    for (bi, hi, wi, ci), (_, ho, wo, co), dt in resizes:
        el = 2 if dt == jnp.bfloat16 else 4
        a, mid, b_ = bi * hi * wi * ci, bi * ho * wi * ci, bi * ho * wo * co
        rs_floor += (a + b_) * el
        rs_xla += (a + 2 * mid + b_) * el
    rows.append((f"decoder resizes x{len(resizes)} (pallas=floor)", rs_floor, rs_floor, 0, 0))
    rows.append(("decoder resizes (XLA 2-pass)", rs_floor, rs_xla, 0, 0))

    # --- conv roofline: per-conv floor and a lane-aware achievable estimate.
    # The MXU contracts over K = kh*kw*Cin rows and emits Cout lanes; a conv
    # with K or Cout below 128 leaves that fraction of the array idle (an
    # ESTIMATE of XLA's realized tiling, not a bound — the eff=1 column is
    # the bound).  Bytes = activations in + out + weights, once each.
    conv_floor_ms = conv_est_ms = conv_flops = conv_bytes = 0.0
    for lhs, rhs, out, dt in convs:
        el = 2 if dt == jnp.bfloat16 else 4
        kh, kw, cin, cout = rhs
        fl = 2.0 * math.prod(out) * kh * kw * cin  # shapes traced at batch B
        by = (math.prod(lhs) + math.prod(out)) * el + math.prod(rhs) * 4
        eff = min(1.0, kh * kw * cin / 128.0) * min(1.0, cout / 128.0)
        conv_floor_ms += max(fl / (MXU_TFLOPS * 1e9), by / (stream_gbs * 1e6))
        conv_est_ms += max(fl / (MXU_TFLOPS * 1e9 * eff), by / (stream_gbs * 1e6))
        conv_flops += fl
        conv_bytes += by

    mxu_ms = flops / (MXU_TFLOPS * 1e12) * 1e3
    print(f"batch {B}, {model_kind} 512x1024/p128/f80/n4, bf16 trunk + f16 merge")
    print(f"convs: {len(convs)} ops, {conv_flops/1e12:.2f} TFLOP, "
          f"{conv_bytes/1e9:.2f} GB -> roofline floor {conv_floor_ms:.1f} ms, "
          f"lane-aware estimate {conv_est_ms:.1f} ms")
    print(f"model FLOPs (XLA cost analysis): {flops/1e12:.2f} TFLOP "
          f"-> MXU floor {mxu_ms:.1f} ms at {MXU_TFLOPS:.0f} TFLOP/s")
    print(f"rates: stream {stream_gbs:.0f} GB/s; gather per-index "
          f"{GATHER_NS_BY_ROW_BYTES} (row-bytes, ns/idx)\n")
    print(f"{'stage':38s} {'floor ms':>9s} {'gthr ms':>9s} {'strm ms':>9s} {'impl ms':>9s}")
    tot_floor = tot_impl = 0.0
    for name, fb, sb, n_idx, row_b in rows:
        fms = fb / (stream_gbs * 1e6)
        gms = n_idx * gather_ns_per_index(row_b) / 1e6 if n_idx else 0.0
        sms = sb / (stream_gbs * 1e6)
        ims = gms + sms
        if "XLA 2-pass" not in name:
            tot_floor += fms
            tot_impl += ims
        print(f"{name:38s} {fms:9.2f} {gms:9.2f} {sms:9.2f} {ims:9.2f}")
    print(f"\nmerge index floor (any gather formulation): {iters}x{live_quads} live "
          f"quads x {gather_ns_per_index(4 * (B * 2) * 2):.1f} ns = {idx_floor_ms:.1f} ms")
    print(f"non-trunk floor {tot_floor:.1f} ms (byte floor; the gather index "
          f"floor above binds tighter) / current-impl bound {tot_impl:.1f} ms;"
          f"  + MXU floor {mxu_ms:.1f} ms (overlaps with the trunk's own HBM"
          " time, not with the projection stages)")
    print(json.dumps({
        "flops_t": round(flops / 1e12, 3),
        "mxu_floor_ms": round(mxu_ms, 2),
        "nontrunk_floor_ms": round(tot_floor, 2),
        "nontrunk_impl_bound_ms": round(tot_impl, 2),
        "merge_index_floor_ms": round(idx_floor_ms, 2),
    }))

    if not train:
        return

    # --- train-step bound (VERDICT-r3 #8): forward + backward + update.
    # Convs: backward-data and backward-weights each cost ~forward FLOPs
    # (same contraction sizes), so the lane-aware estimate scales x3.
    # Resizes: the bilinear adjoint moves the same bytes -> x2.
    # Projections: forward gathers as above, plus each custom VJP's
    # transposed-table gather (quad-granular: indices = dense K_T table +
    # COO overflow, rows = d_pad cotangent lanes — the 4-corner split is
    # recovered by rolls at stream rate, charged as 4x the gather output).
    print("\n--- train step bound ---")
    conv3 = 3.0 * conv_est_ms
    rs2 = 2.0 * rs_xla / (stream_gbs * 1e6)

    def vjp_gather(vjp, d_lanes, el, n_in_t):
        idx_t, w_t, over_src, over_dst, over_w = vjp
        n_idx = int(np.asarray(idx_t).size) + int(np.asarray(over_src).shape[0])
        d_pad = _pad(d_lanes, 64)
        g_ms = n_idx * gather_ns_per_index(d_pad * el) / 1e6
        # pack reads cotangent + gather result write + 3 rolls + scatter out
        s_bytes = (2 * n_in_t * d_pad + 5 * n_idx * d_pad) * el
        return g_ms + s_bytes / (stream_gbs * 1e6), n_idx

    e2p_bwd_ms, e2p_bwd_idx = vjp_gather(g_e2p.vjp, B * 3, 2, n_erp)
    mrg1_ms, mrg_bwd_idx = vjp_gather(g_p2e.vjp, B * 2, 2, n_pp)
    mrg_bwd_ms = iters * mrg1_ms
    q_bwd_ms = q_bwd_idx = 0
    if iters > 1:  # refinement depth re-projection is param-dependent
        q1_ms, q_bwd_idx = vjp_gather(g_e2p_q.vjp, B * 1, 2, n_erp)
        q_bwd_ms = (iters - 1) * q1_ms
    fwd_proj_ms = sum(
        sb / (stream_gbs * 1e6) + n_i * gather_ns_per_index(rb) / 1e6
        for name, fb, sb, n_i, rb in rows
        if "XLA 2-pass" not in name and "resizes" not in name
    )
    # optimizer: Adam reads p/m/v/g and writes p/m/v (7 f32 passes over
    # the param tree), plus the grad tree written once by the bwd
    n_params = sum(
        math.prod(x.shape) for x in jax.tree.leaves(var_shapes["params"])
    )
    opt_ms = n_params * 8 * 4 / (stream_gbs * 1e6)
    total = conv3 + rs2 + fwd_proj_ms + e2p_bwd_ms + mrg_bwd_ms + q_bwd_ms + opt_ms
    print(f"convs x3 (fwd + bwd-data + bwd-weights): {conv3:8.1f} ms")
    print(f"resizes x2 (XLA 2-pass + adjoint):       {rs2:8.1f} ms")
    print(f"projection forwards:                     {fwd_proj_ms:8.1f} ms")
    print(f"e2p transposed VJP  ({e2p_bwd_idx} idx):  {e2p_bwd_ms:8.1f} ms")
    print(f"merge transposed VJP ({iters}x{mrg_bwd_idx} idx): {mrg_bwd_ms:8.1f} ms")
    if iters > 1:
        print(f"quarter-e2p transposed VJP ({q_bwd_idx} idx): {q_bwd_ms:8.1f} ms")
    print(f"optimizer update ({n_params/1e6:.1f}M params, Adam): {opt_ms:8.1f} ms")
    print(f"train-step accounted bound:              {total:8.1f} ms "
          "(+ BN stats, loss, layout copies)")
    print(json.dumps({"train_bound_ms": round(total, 1), "model": model_kind}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--calibrate", nargs="?", const="all",
                    choices=("all", "stream", "gather", "gather_wide", "order"),
                    help="measure HBM rates on the chip (phased so each fits "
                         "a measurement-queue cap); accounting still runs after")
    ap.add_argument("--stream_gbs", type=float, default=DEFAULT_STREAM_GBS)
    ap.add_argument("--no_account", action="store_true",
                    help="calibrate only (skip the accounting pass)")
    ap.add_argument("--train", action="store_true",
                    help="also print the train-step bound (fwd+bwd+update)")
    ap.add_argument("--model", choices=("oneshot", "iterative"), default="oneshot",
                    help="iterative = 2-pass refinement (trunk x2 shared weights, "
                         "merge x2, quarter-res depth re-projection)")
    args = ap.parse_args()
    if args.calibrate:
        calibrate(args.calibrate)
    if not args.no_account:
        account(args.batch, args.stream_gbs, train=args.train,
                model_kind=args.model)


if __name__ == "__main__":
    main()
