"""Command-line entry point (SURVEY.md section 3, component 31).

Examples:
  python -m turbotpu.cli ber --config c1
  python -m turbotpu.cli ber --k 512 --iters 6 --mode maxlog --ebn0 0.5 1.0 1.5
  python -m turbotpu.cli bench --k 6144 --batch 64 --iters 6 --siso scan
  python -m turbotpu.cli bench --profile /tmp/trace
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_common(p):
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu)")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="turbotpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    ber = sub.add_parser("ber", help="Monte-Carlo BER/FER sweep")
    _add_common(ber)
    ber.add_argument("--config",
                     choices=["c1", "c2", "c3", "c3rm", "c4", "c5"])
    ber.add_argument("--k", type=int, default=1024)
    ber.add_argument("--batch", type=int, default=32)
    ber.add_argument("--iters", type=int, default=8)
    ber.add_argument("--mode", choices=["logmap", "maxlog", "linlog"], default="logmap")
    ber.add_argument("--interleaver", choices=["lte", "umts"], default="lte")
    ber.add_argument("--early-term", choices=["none", "crc", "sign"],
                     default="none")
    ber.add_argument("--siso", default="scan")
    ber.add_argument("--window", type=int, default=0)
    ber.add_argument("--io-dtype", default="float32",
                     choices=["float32", "bfloat16"],
                     help="channel-LLR HBM dtype on the Pallas path")
    ber.add_argument("--ext-dtype", default="",
                     choices=["", "float32", "bfloat16", "float8_e4m3fn",
                              "int8"],
                     help="extrinsic-stream HBM dtype (default: io-dtype); "
                          "int8/f8 halve the interleave-gather and "
                          "seq-exchange bytes")
    ber.add_argument("--nii", action="store_true",
                     help="Pallas path: windowed NII alpha init "
                          "(~30%% faster, ~0.03 dB; see RESULTS.md)")
    ber.add_argument("--ebn0", type=float, nargs="+", default=[0.0, 0.5, 1.0])
    ber.add_argument("--E", type=int, default=0, help="rate-matched length")
    ber.add_argument("--rv", type=int, default=0)
    ber.add_argument("--rv-seq", type=int, nargs="+", default=None,
                     help="HARQ IR redundancy-version sequence, e.g. "
                          "--rv-seq 0 2 3 1 (requires --E)")
    ber.add_argument("--modulation",
                     choices=["bpsk", "qpsk", "qam16", "qam64"],
                     default="bpsk")
    ber.add_argument("--channel", choices=["awgn", "rayleigh"],
                     default="awgn",
                     help="rayleigh = flat per-symbol fading, perfect CSI")
    ber.add_argument("--k-mix", type=int, nargs="+", default=None,
                     help="TRUE mixed block sizes cycled over the batch, "
                          "each with its own interleaver/length, decoded "
                          "in one compiled call at the --k bucket (e.g. "
                          "--k 5114 --k-mix 320 1280 5114)")
    ber.add_argument("--e-mix", type=int, nargs="+", default=None,
                     help="per --k-mix rate-matched lengths (with --k-mix "
                          "but no --e-mix, --E is split proportionally)")
    ber.add_argument("--min-frame-errors", type=int, default=50)
    ber.add_argument("--max-frames", type=int, default=200_000)
    ber.add_argument("--seed", type=int, default=0)
    ber.add_argument("--results", default="results/ber.jsonl")
    ber.add_argument("--no-resume", action="store_true")
    ber.add_argument("--compact", type=int, default=0, metavar="S1_ITERS",
                     help="sweep-level convergence compaction: stage-1 "
                          "decode each super-batch at this iteration cap, "
                          "re-batch CRC failures host-side, finish at the "
                          "full cap (bit-identical counts; needs "
                          "--early-term crc, homogeneous K)")
    ber.add_argument("--compact-flush", type=int, default=0, metavar="R",
                     help="with --compact: accumulate failures across "
                          "check groups (up to R retained super-batches) "
                          "and flush only when a dense full batch is "
                          "ready -- more device work saved; stopping rule "
                          "becomes conservative between flushes")

    bench = sub.add_parser("bench", help="decode throughput benchmark")
    _add_common(bench)
    bench.add_argument("--k", type=int, default=6144)
    bench.add_argument("--batch", type=int, default=64)
    bench.add_argument("--iters", type=int, default=6)
    bench.add_argument("--mode", choices=["logmap", "maxlog", "linlog"], default="maxlog")
    bench.add_argument("--siso", default="scan")
    bench.add_argument("--window", type=int, default=0)
    bench.add_argument("--io-dtype", default="float32",
                       choices=["float32", "bfloat16"],
                       help="channel-LLR HBM dtype on the Pallas path")
    bench.add_argument("--ext-dtype", default="",
                       choices=["", "float32", "bfloat16", "float8_e4m3fn",
                                "int8"],
                       help="extrinsic-stream HBM dtype (default: io-dtype)")
    bench.add_argument("--nii", action="store_true",
                       help="Pallas path: windowed NII alpha init "
                            "(~30%% faster, ~0.03 dB; see RESULTS.md)")
    bench.add_argument("--early-term", choices=["none", "crc", "sign"],
                       default="none",
                       help="measure EFFECTIVE throughput with early exit")
    bench.add_argument("--ebn0", type=float, default=1.0,
                       help="operating Eb/N0 for early-term benchmarks")
    bench.add_argument("--reps", type=int, default=10)
    bench.add_argument("--compact", type=int, default=0, metavar="S1_ITERS",
                       help="sweep-level convergence compaction: decode "
                            "super-batches at this stage-1 iteration cap, "
                            "re-batch CRC failures densely, finish at the "
                            "full cap (requires --early-term crc; "
                            "harness/compact.py)")
    bench.add_argument("--n-super", type=int, default=8,
                       help="super-batches per compaction pass")
    bench.add_argument("--profile", default=None,
                       help="write a jax.profiler trace to this directory")

    sc = sub.add_parser("scaling", help="multi-device scaling efficiency")
    _add_common(sc)
    sc.add_argument("--k", type=int, default=6144)
    sc.add_argument("--per-device-batch", type=int, default=1024)
    sc.add_argument("--iters", type=int, default=6)
    sc.add_argument("--siso", default="pallas")
    sc.add_argument("--devices", type=int, nargs="+", default=None)
    sc.add_argument("--json-out", default=None,
                    help="also write the records (with an 'efficiency' "
                         "field per device count) to this JSON file -- the "
                         "scrapeable scaling artifact for real multi-chip "
                         "runs (BASELINE >= 85%% target)")

    sup = sub.add_parser(
        "supervise",
        help="run a turbotpu command under the failure-recovery supervisor: "
             "relaunch on crash or results-file stall, resuming from the "
             "JSONL checkpoint (SURVEY.md section 6)")
    sup.add_argument("--max-restarts", type=int, default=3)
    sup.add_argument("--stall-timeout", type=float, default=None,
                     help="seconds without results-file growth before the "
                          "run is declared hung and relaunched")
    sup.add_argument("--results", default="results/ber.jsonl",
                     help="results file watched for progress (must match "
                          "the wrapped command's --results)")
    sup.add_argument("rest", nargs=argparse.REMAINDER,
                     help="the turbotpu command to supervise, e.g. "
                          "supervise -- ber --config c4")

    c5 = sub.add_parser("c5", help="C5 acceptance: sharded batch decode "
                        "with windowed BCJR + boundary collectives")
    _add_common(c5)
    c5.add_argument("--k", type=int, default=6144)
    c5.add_argument("--batch", type=int, default=4096)
    c5.add_argument("--ebn0", type=float, default=0.8)
    c5.add_argument("--iters", type=int, default=6)
    c5.add_argument("--data", type=int, default=None)
    c5.add_argument("--seq", type=int, default=2)
    c5.add_argument("--siso", default="pallas",
                    help="chunk SISO: pallas (fused kernel) or scan")
    c5.add_argument("--io-dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    c5.add_argument("--nii", action="store_true",
                    help="NII inside the chunk kernel too (window-start "
                         "alphas inherited across half-iterations): the "
                         "flagship-speed seq-parallel path")
    c5.add_argument("--window", type=int, default=0)
    c5.add_argument("--ext-dtype", default="",
                    choices=["", "float32", "bfloat16", "float8_e4m3fn",
                             "int8"],
                    help="extrinsic/exchange dtype (int8 halves the "
                         "all_to_all payload; BER-validated at 0.00 dB)")
    c5.add_argument("--groups", type=int, default=1,
                    help="split-batch pipelining groups (seq_groups): "
                         "overlap exchange with kernel via async "
                         "collectives; needs local batch >= groups*1024 "
                         "whole cells AND --xch ppermute (silently runs "
                         "unsplit with --xch dma -- the result record's "
                         "seq_groups_effective field shows what ran)")
    c5.add_argument("--xch", default="ppermute",
                    choices=["ppermute", "dma"],
                    help="boundary-metric exchange backend")
    c5.add_argument("--early-term", choices=["none", "crc", "sign"],
                    default="crc",
                    help="none = fixed-iteration lean loop (the "
                         "throughput-comparable mode)")
    c5.add_argument("--reps", type=int, default=4,
                    help="timed on-device decode reps chained per fetch")

    tb = sub.add_parser("tb", help="transport-block Monte-Carlo: TB > 6144 "
                        "bits through segmentation, per-block rate "
                        "matching, one mixed-K device decode, CRC-24A/B")
    _add_common(tb)
    tb.add_argument("--config", choices=["c6"],
                    help="run the named acceptance config instead of "
                         "the ad-hoc flags")
    tb.add_argument("--a", type=int, default=12000, help="info bits per TB")
    tb.add_argument("--n-tb", type=int, default=8)
    tb.add_argument("--ebn0", type=float, nargs="+", default=[0.6, 0.8, 1.0])
    tb.add_argument("--G", type=int, default=0,
                    help="rate-matched channel bits per TB per transmission "
                         "(0 = mother rate)")
    tb.add_argument("--rv-seq", type=int, nargs="+", default=None)
    tb.add_argument("--iters", type=int, default=6)
    tb.add_argument("--mode", choices=["logmap", "maxlog", "linlog"],
                    default="maxlog")
    tb.add_argument("--siso", default="pallas")
    tb.add_argument("--io-dtype", default="float32",
                    choices=["float32", "bfloat16"])
    tb.add_argument("--nii", action="store_true")
    tb.add_argument("--window", type=int, default=0)
    tb.add_argument("--min-tb-errors", type=int, default=20)
    tb.add_argument("--max-tbs", type=int, default=20_000)
    tb.add_argument("--seed", type=int, default=0)
    tb.add_argument("--results", default="results/tb.jsonl")
    tb.add_argument("--no-resume", action="store_true")

    args = ap.parse_args(argv)

    import jax
    try:
        # Persistent compile cache: the fused decode chains take minutes
        # to compile cold; cached runs start in seconds (bench.py does
        # the same).
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    if getattr(args, "platform", None):
        jax.config.update("jax_platforms", args.platform)

    from turbotpu.decoder.turbo import DecoderConfig

    if args.cmd == "ber":
        from turbotpu.harness.ber import SimConfig, simulate_ber
        if args.config:
            from configs.acceptance import ALL
            cfgs = ALL[args.config]
            if not isinstance(cfgs, tuple):
                cfgs = (cfgs,)
        else:
            dec = DecoderConfig(K=args.k, n_iters=args.iters, mode=args.mode,
                                io_dtype=args.io_dtype, nii=args.nii,
                                ext_dtype=args.ext_dtype,
                                interleaver=args.interleaver,
                                early_term=args.early_term,
                                siso=args.siso, window=args.window)
            cfgs = (SimConfig(name=f"cli_k{args.k}_{args.mode}", K=args.k,
                              B=args.batch, ebn0_db_grid=tuple(args.ebn0),
                              decoder=dec, E=args.E, rv=args.rv,
                              rv_sequence=tuple(args.rv_seq or ()),
                              K_mix=tuple(args.k_mix or ()),
                              E_mix=tuple(args.e_mix or ()),
                              modulation=args.modulation,
                              channel=args.channel,
                              use_crc=args.early_term == "crc",
                              min_frame_errors=args.min_frame_errors,
                              max_frames=args.max_frames, seed=args.seed),)
        for cfg in cfgs:
            simulate_ber(cfg, results_path=args.results,
                         resume=not args.no_resume,
                         compact_stage1=args.compact,
                         compact_flush=args.compact_flush)
        return 0

    if args.cmd == "bench":
        from turbotpu.harness.bench import bench_decode
        cfg = DecoderConfig(K=args.k, n_iters=args.iters, mode=args.mode,
                            siso=args.siso, window=args.window,
                            io_dtype=args.io_dtype, nii=args.nii,
                            ext_dtype=args.ext_dtype,
                            early_term=args.early_term)
        if args.compact:
            from turbotpu.harness.compact import bench_compaction
            rec = bench_compaction(cfg, args.batch, args.ebn0,
                                   n_super=args.n_super,
                                   stage1_iters=args.compact)
            print(json.dumps(rec))
            return 0
        if args.profile:
            import jax
            rec = bench_decode(cfg, args.batch, n_timed=2)
            with jax.profiler.trace(args.profile):
                rec = bench_decode(cfg, args.batch, n_timed=2, n_warmup=0)
            print(f"profile written to {args.profile}", file=sys.stderr)
        else:
            rec = bench_decode(cfg, args.batch, n_timed=args.reps,
                               ebn0_db=args.ebn0)
        print(json.dumps(rec))
        return 0

    if args.cmd == "scaling":
        from turbotpu.harness.scaling import bench_scaling
        cfg = DecoderConfig(K=args.k, n_iters=args.iters, mode="maxlog",
                            siso=args.siso)
        recs = bench_scaling(cfg, args.per_device_batch, args.devices)
        for rec in recs:
            print(json.dumps(rec))
        if args.json_out:
            import pathlib
            pathlib.Path(args.json_out).write_text(json.dumps(recs, indent=1))
        return 0

    if args.cmd == "supervise":
        from turbotpu.harness.supervisor import supervise
        rest = [a for a in args.rest if a != "--"]
        if not rest:
            ap.error("supervise needs a command after --")
        argv_child = [sys.executable, "-m", "turbotpu.cli"] + rest
        restarts = supervise([argv_child], max_restarts=args.max_restarts,
                             stall_timeout_s=args.stall_timeout,
                             results_path=args.results)
        print(json.dumps({"restarts": restarts, "ok": True}))
        return 0

    if args.cmd == "c5":
        from turbotpu.harness.c5 import run_c5
        rec = run_c5(K=args.k, B=args.batch, ebn0_db=args.ebn0,
                     n_iters=args.iters, data=args.data, seq=args.seq,
                     siso=args.siso, io_dtype=args.io_dtype, nii=args.nii,
                     window=args.window, boundary_xch=args.xch,
                     early_term=args.early_term, n_timed=args.reps,
                     ext_dtype=args.ext_dtype, seq_groups=args.groups,
                     verbose=False)
        print(json.dumps(rec))
        return 0

    if args.cmd == "tb":
        from turbotpu.harness.tb import TBConfig, simulate_tbler
        if args.config:
            from configs.acceptance import ALL
            simulate_tbler(ALL[args.config], results_path=args.results,
                           resume=not args.no_resume)
            return 0
        cfg = TBConfig(name=f"cli_tb_a{args.a}", A=args.a, n_tb=args.n_tb,
                       ebn0_db_grid=tuple(args.ebn0), G=args.G,
                       rv_sequence=tuple(args.rv_seq or (0,)),
                       n_iters=args.iters, mode=args.mode, siso=args.siso,
                       io_dtype=args.io_dtype, nii=args.nii,
                       window=args.window,
                       min_tb_errors=args.min_tb_errors,
                       max_tbs=args.max_tbs, seed=args.seed)
        simulate_tbler(cfg, results_path=args.results,
                       resume=not args.no_resume)
        return 0


if __name__ == "__main__":
    sys.exit(main())
