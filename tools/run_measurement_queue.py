"""Run the round's on-chip measurement queue the moment the tunnel is up.

The TPU tunnel in this environment goes down for hours at a stretch
(CLAUDE.md); each queued measurement is therefore gated behind the cheap
bench.py --canary probe and bounded by a per-step timeout, so a mid-queue
outage skips cleanly to the next tunnel window instead of hanging.

    python tools/run_measurement_queue.py                 # full queue
    python tools/run_measurement_queue.py --only pallas   # name filter
    python tools/run_measurement_queue.py --list

Results append to tools/measurements.log (stdout+stderr per step, with
timestamps and rc), which is the round's raw measurement record.
"""

from __future__ import annotations

import argparse
import datetime
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "tools", "measurements.log")

# (name, argv, timeout_s) — timeouts include one cold compile of the step's
# graphs on this host's cache; warm re-runs finish in a fraction.
#
# Round-5 queue (VERDICT r4 "next round"): bracket the round with a green
# bench.py record (#7), settle the TRAINING ceiling with the production
# donating step + the never-measured --remat at b=96/128 (#1), and give the
# iterative model the one-shot's treatment — fwd batch knee + first on-chip
# train numbers (#3).  Every cold compile is a separate --compile_only
# pre-pass entry so timing caps hold (#6); bench_train emits machine-
# readable `OOM needed=.. limit=..` lines and exits 0 on HBM exhaustion.
_T = ["tools/bench_train.py", "--bf16", "--merge_dtype", "f16"]
QUEUE_R5 = [
    ("r5_bench_early", ["bench.py"], 1100),
    # one-shot training ceiling: donation is now production-faithful
    ("r5c_train_b64", _T + ["--batch", "64", "--compile_only"], 1000),
    ("r5t_train_b64", _T + ["--batch", "64"], 600),
    # fresh train profile at the headline batch: locate the ~12 ms of
    # attention-reshape layout copies the b=32 profile attributed (VERDICT #4)
    ("r5_profile_train_b64", ["tools/profile_forward.py", "--batch", "64",
                              "--bf16", "--merge_dtype", "f16", "--train"], 1000),
    ("r5c_train_b96", _T + ["--batch", "96", "--compile_only"], 1400),
    ("r5t_train_b96", _T + ["--batch", "96"], 700),
    ("r5c_train_b128", _T + ["--batch", "128", "--compile_only"], 1800),
    ("r5t_train_b128", _T + ["--batch", "128"], 800),
    # remat: trade FLOPs for HBM — quantify its cost where b fits (64) and
    # its capacity win where b doesn't (128)
    ("r5y_train_b64_remat_c", _T + ["--batch", "64", "--remat", "--compile_only"], 1000),
    ("r5y_train_b64_remat", _T + ["--batch", "64", "--remat"], 600),
    # fwd-compile work halved for the b=128 capacity probes: the b=128
    # FORWARD number is already on record (628 p/s, round 4), so the train
    # entries skip the fwd scan graph; compile caps widened after the
    # 17:55 attempt lost 30 min to a mid-compile tunnel drop
    ("r5x_train_b96", _T + ["--batch", "96"], 700),
    ("r5x_train_b128_c", _T + ["--batch", "128", "--skip_fwd",
                               "--compile_only"], 2400),
    ("r5x_train_b128", _T + ["--batch", "128", "--skip_fwd"], 800),
    ("r5x_train_b128_remat_c", _T + ["--batch", "128", "--skip_fwd",
                                     "--remat", "--compile_only"], 2400),
    ("r5x_train_b128_remat", _T + ["--batch", "128", "--skip_fwd",
                                   "--remat"], 800),
    # iterative model: fwd batch knee (the one-shot gained +11% from b=256)
    ("r5_iter_sweep_b128", ["tools/bench_sweep.py", "--batches", "128",
                            "--modes", "f16_merge", "--model", "iterative"], 900),
    ("r5_iter_sweep_b192", ["tools/bench_sweep.py", "--batches", "192",
                            "--modes", "f16_merge", "--model", "iterative"], 900),
    ("r5_iter_sweep_b256", ["tools/bench_sweep.py", "--batches", "256",
                            "--modes", "f16_merge", "--model", "iterative"], 900),
    # first on-chip iterative TRAIN numbers (train_erp_depth_iterative.py)
    ("r5c_train_iter_b32", _T + ["--batch", "32", "--model", "iterative",
                                 "--skip_fwd", "--compile_only"], 1400),
    ("r5t_train_iter_b32", _T + ["--batch", "32", "--model", "iterative",
                                 "--skip_fwd"], 700),
    ("r5c_train_iter_b64", _T + ["--batch", "64", "--model", "iterative",
                                 "--skip_fwd", "--compile_only"], 1800),
    ("r5t_train_iter_b64", _T + ["--batch", "64", "--model", "iterative",
                                 "--skip_fwd"], 800),
]

# Round-5 phase 2: the resolution-scaling stretch probe (VERDICT #9 —
# 1024x2048 / nrows 6 / 46 patches; the static tables grow ~4x) and the
# round-end bench bracket (#7).  Launched after the main r5 queue so the
# training-ceiling answers land first.
_H = ["tools/bench_train.py", "--bf16", "--merge_dtype", "f16",
      "--erp", "1024,2048", "--nrows", "6", "--fwd_only"]
QUEUE_R5B = [
    # resize-formulation A/B in the TRAIN step (VERDICT #4: collect the
    # ~12 ms of relayout copies around the decoder-resize backward; the
    # stencil/conv impls keep fwd+grad exact — tests/test_layers.py)
    ("r5b_tr64_stencil_c", _T + ["--batch", "64", "--skip_fwd",
                                 "--resize_impl", "stencil", "--compile_only"], 1000),
    ("r5b_tr64_stencil", _T + ["--batch", "64", "--skip_fwd",
                               "--resize_impl", "stencil"], 600),
    ("r5b_tr64_conv_c", _T + ["--batch", "64", "--skip_fwd",
                              "--resize_impl", "conv", "--compile_only"], 1000),
    ("r5b_tr64_conv", _T + ["--batch", "64", "--skip_fwd",
                            "--resize_impl", "conv"], 600),
    ("r5b_hires_compile_b32", _H + ["--batch", "32", "--compile_only"], 1800),
    ("r5b_hires_fwd_b32", _H + ["--batch", "32"], 800),
    ("r5b_hires_compile_b64", _H + ["--batch", "64", "--compile_only"], 1800),
    ("r5b_hires_fwd_b64", _H + ["--batch", "64"], 800),
    ("r5b_bench_late", ["bench.py"], 1100),
]

# Round-5 phase 3 (r5z), informed by the phase-2 results:
#  - resize_impl=conv WON the train A/B at b=64 (268.7 ms vs 275.7 same-day
#    xla; stencil lost at 308.6) — measure the FORWARD at the b=256 headline
#    batch before deciding the production default (both arms through the
#    same bench_train --fwd_only harness so the A/B is apples-to-apples).
#  - the iterative knee was still climbing at b=256 (401.3 -> 423.9 ->
#    442.8 panos/s); probe b=320 (the one-shot dipped there, but the
#    iterative's quarter-res second pass has a smaller live set).
#  - the 1024x2048/nrows-6 stretch OOM'd fwd at b=32 (19.14G) and b=64
#    (24.49G); the linear fit (~13.8G base + 0.167G/pano) says b=8 is
#    marginal — probe b=16 and b=8 so the scaling story gets either a real
#    throughput datapoint or a capacity line at the smallest useful batch.
_F = ["tools/bench_train.py", "--bf16", "--merge_dtype", "f16", "--fwd_only"]
QUEUE_R5Z = [
    ("r5z_fwd256_xla_c", _F + ["--batch", "256", "--compile_only"], 1600),
    ("r5z_fwd256_xla", _F + ["--batch", "256"], 700),
    ("r5z_fwd256_conv_c", _F + ["--batch", "256", "--resize_impl", "conv",
                                "--compile_only"], 1600),
    ("r5z_fwd256_conv", _F + ["--batch", "256", "--resize_impl", "conv"], 700),
    ("r5z_iter_sweep_b320", ["tools/bench_sweep.py", "--batches", "320",
                             "--modes", "f16_merge", "--model", "iterative"], 1200),
    ("r5z_hires_c_b16", _H + ["--batch", "16", "--compile_only"], 2400),
    ("r5z_hires_fwd_b16", _H + ["--batch", "16"], 800),
    ("r5z_hires_c_b8", _H + ["--batch", "8", "--compile_only"], 2400),
    ("r5z_hires_fwd_b8", _H + ["--batch", "8"], 800),
]

# Round-5 final: validate the conv-resize default flip through the real
# headline harness (the fwd A/B measured 667.2 vs 638.6 panos/s at b=256,
# r5z_fwd256_conv 06:05) so BENCH_LAST_GOOD and the committed record carry
# an on-chip number for the shipped default, plus a conv-default train
# confirmation at the b=64 knee.
QUEUE_R5F = [
    ("r5f_bench_conv", ["bench.py"], 1100),
    ("r5f_train_b64_conv_c", _T + ["--batch", "64", "--skip_fwd",
                                   "--compile_only"], 1600),
    ("r5f_train_b64_conv", _T + ["--batch", "64", "--skip_fwd"], 600),
]

# Round-5 restart queue: the host rebooted mid-round (2026-08-19 ~21:37Z),
# wiping the compile caches AND the log lines for the prior window's direct
# runs (the b=96 / b=128 / b=128-remat training numbers PERF_NOTES cites).
# Every perf claim needs a log line behind it (CLAUDE.md), so the claims are
# RE-MEASURED here first, then the still-missing VERDICT items in priority
# order: iterative train (#3), resize A/B in the train step (#4), remat cost
# where it fits (#1), the 1024x2048 stretch (#9), and the late bench bracket
# (#7).  Caps assume cold compiles on a 1-vCPU host.
QUEUE_R5R = [
    # integrity: re-back the PERF_NOTES train-scan claims with log lines
    ("r5x_train_b96_c", _T + ["--batch", "96", "--skip_fwd", "--compile_only"], 2000),
    ("r5x_train_b96", _T + ["--batch", "96", "--skip_fwd"], 700),
    # the b=128 OOMs surface at train_compile, so the compile_only entry IS
    # the capacity datapoint (one `OOM needed=.. limit=..` line, rc=0)
    ("r5x_train_b128_c", _T + ["--batch", "128", "--skip_fwd", "--compile_only"], 2800),
    ("r5x_train_b128_remat_c", _T + ["--batch", "128", "--skip_fwd",
                                     "--remat", "--compile_only"], 2800),
    # iterative model: fwd batch knee + FIRST on-chip train numbers
    ("r5_iter_sweep_b128", ["tools/bench_sweep.py", "--batches", "128",
                            "--modes", "f16_merge", "--model", "iterative"], 1200),
    ("r5_iter_sweep_b192", ["tools/bench_sweep.py", "--batches", "192",
                            "--modes", "f16_merge", "--model", "iterative"], 1200),
    ("r5_iter_sweep_b256", ["tools/bench_sweep.py", "--batches", "256",
                            "--modes", "f16_merge", "--model", "iterative"], 1200),
    ("r5c_train_iter_b32", _T + ["--batch", "32", "--model", "iterative",
                                 "--skip_fwd", "--compile_only"], 2000),
    ("r5t_train_iter_b32", _T + ["--batch", "32", "--model", "iterative",
                                 "--skip_fwd"], 700),
    ("r5c_train_iter_b64", _T + ["--batch", "64", "--model", "iterative",
                                 "--skip_fwd", "--compile_only"], 2400),
    ("r5t_train_iter_b64", _T + ["--batch", "64", "--model", "iterative",
                                 "--skip_fwd"], 800),
    # resize-formulation A/B in the real train step (VERDICT #4)
    ("r5b_tr64_xla_c", _T + ["--batch", "64", "--skip_fwd", "--compile_only"], 1600),
    ("r5b_tr64_xla", _T + ["--batch", "64", "--skip_fwd"], 600),
    ("r5b_tr64_stencil_c", _T + ["--batch", "64", "--skip_fwd",
                                 "--resize_impl", "stencil", "--compile_only"], 1600),
    ("r5b_tr64_stencil", _T + ["--batch", "64", "--skip_fwd",
                               "--resize_impl", "stencil"], 600),
    ("r5b_tr64_conv_c", _T + ["--batch", "64", "--skip_fwd",
                              "--resize_impl", "conv", "--compile_only"], 1600),
    ("r5b_tr64_conv", _T + ["--batch", "64", "--skip_fwd",
                            "--resize_impl", "conv"], 600),
    # remat cost where the batch FITS (completes the remat matrix)
    ("r5y_train_b64_remat_c", _T + ["--batch", "64", "--skip_fwd",
                                    "--remat", "--compile_only"], 1600),
    ("r5y_train_b64_remat", _T + ["--batch", "64", "--skip_fwd", "--remat"], 600),
    # 1024x2048 / nrows 6 resolution-scaling stretch (VERDICT #9)
    ("r5b_hires_compile_b32", _H + ["--batch", "32", "--compile_only"], 2400),
    ("r5b_hires_fwd_b32", _H + ["--batch", "32"], 800),
    ("r5b_hires_compile_b64", _H + ["--batch", "64", "--compile_only"], 2400),
    ("r5b_hires_fwd_b64", _H + ["--batch", "64"], 800),
    # round-end bracket (#7)
    ("r5b_bench_late", ["bench.py"], 1100),
]

# Round-4b follow-up queue (completed; kept for the record, --queue r4b).
QUEUE = [
    ("sol_cal_stream", ["tools/sol_model.py", "--calibrate", "stream",
                        "--no_account"], 300),
    ("sol_cal_gather", ["tools/sol_model.py", "--calibrate", "gather",
                        "--no_account"], 600),
    ("sol_cal_order", ["tools/sol_model.py", "--calibrate", "order",
                       "--no_account"], 600),
    ("xtra_profile_xla_b64", ["tools/profile_forward.py", "--batch", "64",
                              "--bf16", "--merge_dtype", "f16"], 700),
    # split per batch so a b=128 HBM OOM cannot take the b=96 datapoint
    ("sweep_b96", ["tools/bench_sweep.py", "--batches", "96",
                   "--modes", "f16_merge"], 700),
    ("sweep_b128", ["tools/bench_sweep.py", "--batches", "128",
                    "--modes", "f16_merge"], 700),
    # refresh the iterative-model number (the reference's canonical eval
    # protocol) under the round-4 code — last measured round 3 (274.3 p/s)
    ("xtd_iterative_b64", ["tools/bench_sweep.py", "--batches", "64",
                           "--modes", "f16_merge", "--model", "iterative"], 900),
    # b=128 beat b=64 (587.4 vs 574.7 — per-index gather cost amortizes
    # with row width); find the knee before moving the bench default
    ("xtd_sweep_b160", ["tools/bench_sweep.py", "--batches", "160",
                        "--modes", "f16_merge"], 700),
    ("xtd_sweep_b192", ["tools/bench_sweep.py", "--batches", "192",
                        "--modes", "f16_merge"], 700),
    # the multiple-of-64 batches keep climbing (64 -> 574.7, 128 -> 587.4,
    # 192 -> 625.3 panos/s; 96/160 dip on lane padding) — walk to the knee
    ("xtd2_sweep_b256", ["tools/bench_sweep.py", "--batches", "256",
                         "--modes", "f16_merge"], 700),
    ("xtd2_sweep_b320", ["tools/bench_sweep.py", "--batches", "320",
                         "--modes", "f16_merge"], 700),
    ("xtd2_sweep_b384", ["tools/bench_sweep.py", "--batches", "384",
                         "--modes", "f16_merge"], 700),
    # validate the moved default (BATCH=256) through the real headline
    # harness before the driver runs it
    ("xtd3_bench_b256", ["bench.py"], 1100),
    # does the per-index amortization hold for TRAINING too?  b=32 is the
    # documented 182.4 ms / 20.7% MFU point; b=64 doubles the transposed
    # gathers' row width (b=128 is the OOM probe — fwd+bwd activations
    # triple the forward's footprint, so expect it to fail like b=384 fwd)
    ("xtd4_train_b64", ["tools/bench_train.py", "--batch", "64", "--bf16",
                        "--merge_dtype", "f16"], 800),
    # first attempt TIMED OUT at 800s mid-compile (no OOM — the forward
    # half ran at 625.4 p/s); the b=128 train graph just compiles long
    ("xtd4_train_b128", ["tools/bench_train.py", "--batch", "128", "--bf16",
                         "--merge_dtype", "f16"], 1500),
    # pin the wide-row gather regime the b=256 headline actually runs in
    ("xtd5_cal_gather_wide", ["tools/sol_model.py", "--calibrate",
                              "gather_wide", "--no_account"], 600),
]

# Round-4 main queue, completed 2026-08-19 06:30Z (15/16 ok; the failed
# combined calibrate is superseded by the phased entries above).  Kept for
# the record; run with --queue r4.
QUEUE_R4 = [
    # the round's gate, split so each half fits one short tunnel-up window:
    # kernel bisects + flagship-shape resize, then the composed train-step
    # cross-check (3 tiny train-step compiles).  The composed check's first
    # on-chip run (04:10) "failed" on an Adam artifact (first-step updates
    # are +-lr, so elementwise param comparison = sign(grad) agreement) —
    # re-run with the SGD(1.0) gradient-extraction + kink-aware gate.
    ("verify_kernels", ["tools/verify_kernels.py", "--skip_model"], 700),
    ("verify_composed", ["tools/verify_kernels.py", "--only_model"], 900),
    # decision-critical d-major micro benches, one dtype per process so each
    # fits its cap (the combined f16,f32 run TIMED OUT at 420s on 01:28)
    ("pallas_merge_micro_f16", ["tools/bench_pallas_merge.py", "--batch", "64",
                                "--dtypes", "f16", "--only", "merge"], 420),
    ("pallas_e2p_micro", ["tools/bench_pallas_merge.py", "--batch", "64",
                          "--dtypes", "f16", "--only", "e2p"], 420),
    # composed-forward shootout at the bench config (kernel_impl pallas now
    # composes with the measured-faster XLA resize via resize_impl's default)
    ("components_xla_b64", ["tools/bench_components.py", "--batch", "64",
                            "--bf16", "--merge_dtype", "f16",
                            "--only", "e2p,merge,trunk"], 600),
    ("components_pallas_b64", ["tools/bench_components.py", "--batch", "64",
                               "--bf16", "--merge_dtype", "f16",
                               "--kernel_impl", "pallas",
                               "--only", "e2p,merge,trunk"], 600),
    ("components_xla_full", ["tools/bench_components.py", "--batch", "64",
                             "--bf16", "--merge_dtype", "f16",
                             "--only", "full"], 900),
    ("components_pallas_full", ["tools/bench_components.py", "--batch", "64",
                                "--bf16", "--merge_dtype", "f16",
                                "--kernel_impl", "pallas",
                                "--only", "full"], 900),
    # bench.py budgets itself via BENCH_TIMEOUT_SECS (default 900) and emits
    # an honest record line at budget end — the outer cap must outlive that
    ("bench_headline", ["bench.py"], 1100),
    ("train_b32", ["tools/bench_train.py", "--batch", "32", "--bf16",
                   "--merge_dtype", "f16"], 700),
    # "pallas" keeps gradients on the verified XLA transpose (safe to bench
    # regardless of verify_kernels); "pallas_full" numbers only count if
    # verify_kernels + verify_composed went green above
    ("train_b32_pallas", ["tools/bench_train.py", "--batch", "32", "--bf16",
                          "--merge_dtype", "f16",
                          "--kernel_impl", "pallas"], 700),
    ("train_b32_pallas_full", ["tools/bench_train.py", "--batch", "32",
                               "--bf16", "--merge_dtype", "f16",
                               "--kernel_impl", "pallas_full"], 700),
    ("pallas_merge_micro_f32", ["tools/bench_pallas_merge.py", "--batch", "64",
                                "--dtypes", "f32", "--only", "merge"], 420),
    ("xtra_profile_pallas_b64", ["tools/profile_forward.py", "--batch", "64",
                                 "--bf16", "--merge_dtype", "f16",
                                 "--kernel_impl", "pallas"], 700),
    ("xtra_profile_train_b32", ["tools/profile_forward.py", "--batch", "32",
                                "--bf16", "--merge_dtype", "f16",
                                "--train"], 700),
    # HBM stream + random-gather calibration feeding the speed-of-light
    # floor table (tools/sol_model.py, the VERDICT-r2 #4 floor statement)
    ("xtra_sol_calibrate", ["tools/sol_model.py", "--calibrate"], 500),
]


def log(line: str):
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
    with open(LOG, "a") as f:
        f.write(f"[{stamp}Z] {line}\n")
    print(f"[{stamp}Z] {line}", flush=True)


def canary_ok(timeout: float = 45.0) -> bool:
    try:
        rc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--canary"],
            timeout=timeout, capture_output=True,
        ).returncode
        return rc == 0
    except subprocess.TimeoutExpired:
        return False


def wait_for_tunnel(max_probes: int, sleep_s: float) -> bool:
    for i in range(max_probes):
        if canary_ok():
            log(f"canary ok (probe {i + 1})")
            return True
        log(f"canary down (probe {i + 1}/{max_probes}); sleeping {sleep_s:.0f}s")
        time.sleep(sleep_s)
    return False


def run_step(name: str, argv: list[str], timeout: float) -> bool:
    log(f"=== {name}: {' '.join(argv)} (cap {timeout:.0f}s)")
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable] + [os.path.join(REPO, argv[0])] + argv[1:],
            timeout=timeout, capture_output=True, text=True, cwd=REPO,
        )
        body = proc.stdout + ("\n--- stderr ---\n" + proc.stderr if proc.returncode else "")
        log(f"{name} rc={proc.returncode} in {time.time() - t0:.0f}s\n{body.strip()}")
        return proc.returncode == 0
    except subprocess.TimeoutExpired as e:
        out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
        log(f"{name} TIMED OUT after {timeout:.0f}s; partial output:\n{out.strip()}")
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", help="substring filter on step names")
    ap.add_argument("--from", dest="from_name",
                    help="skip queue entries before this name (resume a cut run)")
    ap.add_argument("--queue",
                    choices=("r5f", "r5z", "r5r", "r5", "r5b", "r4b", "r4"),
                    default="r5f")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--max_probes", type=int, default=20,
                    help="canary probes per step before skipping it")
    ap.add_argument("--probe_sleep", type=float, default=120.0)
    args = ap.parse_args()

    queue = {"r5f": QUEUE_R5F, "r5z": QUEUE_R5Z, "r5r": QUEUE_R5R, "r5": QUEUE_R5,
             "r5b": QUEUE_R5B, "r4b": QUEUE, "r4": QUEUE_R4}[args.queue]
    steps = [s for s in queue if not args.only or args.only in s[0]]
    if args.from_name:
        names = [s[0] for s in steps]
        if args.from_name not in names:
            sys.exit(f"--from {args.from_name!r}: not in queue {names}")
        steps = steps[names.index(args.from_name):]
    if args.list:
        for name, argv, cap in steps:
            print(f"{name:24s} {' '.join(argv)}  (cap {cap}s)")
        return

    results = {}
    for name, argv, cap in steps:
        if not wait_for_tunnel(args.max_probes, args.probe_sleep):
            log(f"{name}: SKIPPED (tunnel never answered)")
            results[name] = "skipped"
            continue
        ok = run_step(name, argv, cap)
        if not ok and canary_ok():
            # tunnel is up but the step failed: one retry catches transient
            # mid-step drops; a second failure is a real bug, not weather.
            ok = run_step(name + " (retry)", argv, cap)
        results[name] = "ok" if ok else "FAILED"
    log("QUEUE DONE: " + ", ".join(f"{k}={v}" for k, v in results.items()))
    sys.exit(0 if all(v == "ok" for v in results.values()) else 1)


if __name__ == "__main__":
    main()
