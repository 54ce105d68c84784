"""Communication-cost model for the C5 distributed decode (round-2
VERDICT item 5): an INSPECTABLE argument for the >= 85% scaling target
(BASELINE.json), replacing silence.

Three parts:

1. EXACT per-iteration communication volume, counted from the very
   routing tables the decoder ships (dist.seq_parallel.exchange_tables)
   -- not an estimate.  Per 'seq' ring and per full turbo iteration:
     * extrinsic partitioned all_to_all: 2 exchanges (perm + inv), each
       moving every cross-shard row exactly once; per-shard egress is
       counted per shard from the tables, max over shards reported.
     * boundary metrics: 2 SISOs x (alpha fwd + beta bwd) = 4 ppermute
       payloads of 8 fp32 state metrics per codeword (the NII chunk path
       ships the same 4 edges; interior window starts stay chip-local).
     * CRC partial-syndrome psum: 24 fp32 per codeword.
2. Verified collective COUNTS from the compiled HLO of the real sharded
   decode on the fake 8-device mesh (all-to-all / collective-permute /
   all-reduce inside the iteration body).
3. The scaling model: serialized (zero-overlap, pessimistic) comm time
   against the measured per-iteration compute time of the flagship
   kernel, on public v5e link numbers.  Also states the topology
   argument: 'seq' maps to ICI within a host; the DATA axis -- the one
   that crosses hosts on DCN -- has ZERO per-iteration traffic (one
   scalar psum for lockstep exit + end-of-sweep counter reductions), so
   multi-host scaling is bounded by DP dispatch overhead, not by the
   trellis exchange.

Run:  python experiments/comm_model.py [--k 6144] [--b-local 1024]
Writes experiments/comm_model.json.
"""

from __future__ import annotations

import argparse
import json
import re
import sys

sys.path.insert(0, ".")

import numpy as np

# ---------------------------------------------------------------------------
# Public v5e numbers (Google Cloud TPU v5e product page / scaling book):
# 1,600 Gbps aggregate ICI per chip.  A 1-D ring embedded in the 2D torus
# uses one link pair; we model per-direction per-link usable bandwidth
# conservatively at 25% of aggregate (400 Gbps = 50 GB/s) and report
# sensitivity at 2x either way.
ICI_AGGREGATE_GBPS = 1600.0
ICI_LINK_GBYTES = ICI_AGGREGATE_GBPS / 8 / 4   # 50 GB/s per link direction

# Flagship measured per-chip compute: Gbit/s decoded at K=6144, 6
# iterations, B=1024 -> per-iteration wall time.  (A faster kernel makes
# the zero-overlap seq-axis efficiency numbers slightly MORE pessimistic
# -- comm volume is unchanged.)
FLAGSHIP_GBIT_S = 3.08   # round-4 median of 5 runs, spread 2.9%
                         # (experiments/flagship_tuning.json)
FLAGSHIP_ITERS = 6


def exchange_volume(K: int, n_seq: int, dtype_bytes: int = 2) -> dict:
    """EXACT cross-shard extrinsic row counts from the decoder's own
    routing tables (per codeword, per exchange)."""
    from turbotpu.decoder.turbo import DecoderConfig
    from turbotpu.dist.seq_parallel import chunk_sizing, exchange_tables

    KT = K + 3
    C, _, _, _ = chunk_sizing(KT, n_seq)   # the decoder's own geometry
    cfg = DecoderConfig(K=K)
    perm = np.asarray(cfg.perm(), np.int64)
    ext = np.arange(K, C * n_seq, dtype=np.int64)
    out = {}
    for name, p in (("perm", np.concatenate([perm, ext])),
                    ("inv", np.concatenate(
                        [np.asarray(cfg.inv(), np.int64), ext]))):
        local, send, slot, M = exchange_tables(p, C, n_seq)
        # send[s, j, m] == C marks bucket padding; count real entries.
        real = (send != C).sum(axis=(1, 2))        # per-shard egress rows
        out[name] = {
            "C": C, "M_bucket": int(M),
            "egress_rows_max": int(real.max()),
            "egress_rows_mean": float(real.mean()),
            # all_to_all moves the PADDED buckets: (n_seq-1)*M rows.
            "egress_rows_padded": int((n_seq - 1) * M),
        }
    out["bytes_per_cw_iter"] = int(
        2 * (n_seq - 1) * max(out["perm"]["M_bucket"],
                              out["inv"]["M_bucket"]) * dtype_bytes)
    return out


def hlo_collective_counts(K: int = 320, n_seq: int = 4, data: int = 2,
                          nii: bool = True) -> dict:
    """Compile the real sharded decode on the fake mesh and count the
    collectives XLA actually emitted."""
    import jax
    import jax.numpy as jnp
    from turbotpu.decoder.turbo import DecoderConfig
    from turbotpu.dist.mesh import make_mesh
    from turbotpu.dist.seq_parallel import decode_seq_sharded

    mesh = make_mesh(data=data, seq=n_seq)
    cfg = DecoderConfig(K=K, n_iters=4, mode="maxlog", siso="pallas",
                        early_term="crc", nii=nii)
    dec = decode_seq_sharded(mesh, cfg)
    B = 2 * data
    spec = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(("data",), None))
    args = [jax.device_put(jnp.zeros((B, K), jnp.float32), spec)
            for _ in range(3)]
    tails = [jax.device_put(jnp.zeros((B, 6), jnp.float32), spec)
             for _ in range(2)]
    txt = jax.jit(dec).lower(*args, *tails).compile().as_text()
    return {op: len(re.findall(rf"\b{op}", txt))
            for op in ("all-to-all", "collective-permute", "all-reduce",
                       "all-gather")}


def scaling_model(K: int, b_local: int, n_seq: int,
                  dtype_bytes: int = 2,
                  link_gbytes: float = ICI_LINK_GBYTES,
                  flagship_gbit_s: float = FLAGSHIP_GBIT_S,
                  overlap_groups: int = 1,
                  glue_us_per_half_iter: float = 0.0) -> dict:
    """Per-iteration comm vs compute for a 'seq'-sharded ring decoding ONE
    batch of b_local codewords.

    Scaling efficiency here means T_1chip / (n_seq * T_nseq): each chip
    computes only its C-step chunk (full-trellis time / n_seq, times the
    chunk padding factor), but the extrinsic all_to_all volume per
    codeword does NOT shrink with n_seq -- so deep trellis sharding buys
    LATENCY (T_nseq ~ T_1/n_seq) at a quantified throughput-efficiency
    cost, while pure DP (the 'data' axis) buys throughput at zero
    per-iteration comm.  This is the model's headline conclusion, stated
    in main().

    Round-4 extensions (round-3 VERDICT items 2 and 5):
    * dtype_bytes=1 models int8 extrinsic exchange payloads
      (DecoderConfig.ext_dtype='int8', shipped and BER-tested) -- the
      only comm stream that scales with K halves.
    * overlap_groups=G models DecoderConfig.seq_groups split-batch
      software pipelining (shipped; fake-mesh equivalence-tested): the
      local batch splits into G independent cell groups, so each group's
      all_to_all overlaps the next group's chunk kernel via XLA async
      collectives.  Modeled iteration time = max(compute, comm) +
      comm/G (the pipeline-fill tail stays exposed) -- unverifiable on
      one chip, stated as a model, with the zero-overlap number kept
      alongside.
    * glue_us_per_half_iter injects the MEASURED per-shard glue
      (experiments/seq_glue.py: local exchange gathers + edge selects)
      so the efficiency denominator is no longer kernel+comm rhetoric.
    """
    vol = exchange_volume(K, n_seq, dtype_bytes)
    # Per chip, per iteration, per codeword:
    a2a_bytes = vol["bytes_per_cw_iter"]
    boundary_bytes = 4 * 8 * 4                      # 4 edges x 8 states fp32
    crc_bytes = 24 * 4
    per_cw = a2a_bytes + boundary_bytes + crc_bytes
    comm_s = b_local * per_cw / (link_gbytes * 1e9)
    # Full-trellis per-chip compute (measured flagship), then the chunk
    # share with its padding factor C*n_seq/KT.
    compute_full = (b_local * K / (flagship_gbit_s * 1e9)) / FLAGSHIP_ITERS
    pad = vol["perm"]["C"] * n_seq / (K + 3)
    compute_s = compute_full * pad / n_seq
    compute_s += 2 * glue_us_per_half_iter * 1e-6 * (b_local / 1024)
    if overlap_groups > 1:
        iter_s = max(compute_s, comm_s) + comm_s / overlap_groups
    else:
        iter_s = compute_s + comm_s
    eff = (compute_full / n_seq) / iter_s
    return {
        "K": K, "b_local": b_local, "n_seq": n_seq,
        "ext_dtype_bytes": dtype_bytes,
        "overlap_groups": overlap_groups,
        "glue_us_per_half_iter": glue_us_per_half_iter,
        "a2a_bytes_per_cw_iter": a2a_bytes,
        "boundary_bytes_per_cw_iter": boundary_bytes,
        "crc_psum_bytes_per_cw_iter": crc_bytes,
        "chunk_padding_factor": pad,
        "comm_ms_per_iter": comm_s * 1e3,
        "compute_ms_per_iter_per_chip": compute_s * 1e3,
        "latency_speedup_vs_1chip": compute_full / iter_s,
        "efficiency": eff,
        "efficiency_zero_overlap": (compute_full / n_seq)
        / (compute_s + comm_s),
        "link_gbytes_per_s": link_gbytes,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=6144)
    ap.add_argument("--b-local", type=int, default=1024)
    ap.add_argument("--skip-hlo", action="store_true")
    ap.add_argument("--out", default="experiments/comm_model.json")
    args = ap.parse_args(argv)

    rec = {"seq_sharded": [], "dp_axis": {
        "per_iteration_bytes": 4,
        "note": "the 'data' axis -- the one spanning hosts on DCN -- "
                "moves ONE int32 psum per iteration (lockstep early-exit "
                "flag) plus end-of-sweep counter reductions; per-iteration "
                "trellis traffic is zero by layout, so DP/multi-host "
                "efficiency is bounded by dispatch overhead, not comm",
    }, "conclusion": (
        "The >= 85% scaling target is met on the DATA axis (zero "
        "per-iteration traffic; the v5e-8 throughput configuration is "
        "data=8 x seq=1, projected 8x the measured single-chip flagship "
        "= ~24 Gbit/s >> the 1 Gbit/s target).  Trellis ('seq') sharding "
        "is a LATENCY capability AT n_seq >= 4 ONLY: with the MEASURED "
        "per-shard glue folded in (seq_glue.json), n_seq=2 is "
        "net-negative even for latency (latency_speedup ~0.7) and "
        "n_seq=8 reaches ~1.7x; zero-overlap throughput efficiency is "
        "~22-35% (int8+overlap modes model ~34-46%) because neither the "
        "extrinsic all_to_all volume per codeword nor the exchange's "
        "HBM glue shrinks with n_seq -- use the seq axis for long-block "
        "latency SLOs at n_seq >= 4, never to add throughput.")}
    # Measured per-shard glue curve (experiments/seq_glue.py), if present.
    glue = {}
    try:
        with open("experiments/seq_glue.json") as f:
            glue = {r["n_seq"]: r["glue_us"]
                    for r in json.load(f)["rows"]}
        rec["glue_source"] = "experiments/seq_glue.json (measured on-chip)"
    except Exception:
        rec["glue_source"] = "absent (glue term = 0)"
    for n_seq in (2, 4, 8):
        g = glue.get(n_seq, 0.0)
        m = scaling_model(args.k, args.b_local, n_seq,
                          glue_us_per_half_iter=g)
        # Sensitivity: halve / double the usable link bandwidth.
        m["efficiency_at_half_bw"] = scaling_model(
            args.k, args.b_local, n_seq, glue_us_per_half_iter=g,
            link_gbytes=ICI_LINK_GBYTES / 2)["efficiency_zero_overlap"]
        m["efficiency_at_double_bw"] = scaling_model(
            args.k, args.b_local, n_seq, glue_us_per_half_iter=g,
            link_gbytes=ICI_LINK_GBYTES * 2)["efficiency_zero_overlap"]
        # Round-4 engineering modes: int8 exchange payloads, and int8 +
        # split-batch overlap at G groups (needs b_local >= G*1024).
        m["efficiency_int8"] = scaling_model(
            args.k, args.b_local, n_seq, dtype_bytes=1,
            glue_us_per_half_iter=g)["efficiency_zero_overlap"]
        for G in (2, 4):
            m[f"efficiency_int8_overlap{G}"] = scaling_model(
                args.k, args.b_local, n_seq, dtype_bytes=1,
                overlap_groups=G, glue_us_per_half_iter=g)["efficiency"]
        rec["seq_sharded"].append(m)
        print(f"n_seq={n_seq}: a2a {m['a2a_bytes_per_cw_iter']} B/cw/iter, "
              f"comm {m['comm_ms_per_iter']:.3f} ms vs per-chip compute "
              f"{m['compute_ms_per_iter_per_chip']:.3f} ms -> latency "
              f"speedup {m['latency_speedup_vs_1chip']:.2f}x, zero-overlap "
              f"eff {m['efficiency_zero_overlap']:.1%} | int8 "
              f"{m['efficiency_int8']:.1%} | int8+overlap4 "
              f"{m['efficiency_int8_overlap4']:.1%}")
    if not args.skip_hlo:
        import jax
        try:
            jax.config.update("jax_num_cpu_devices", 8)
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
        rec["hlo_collectives"] = hlo_collective_counts()
        print("HLO collectives (fake 2x4 mesh, nii chunk decode):",
              rec["hlo_collectives"])
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"written {args.out}")


if __name__ == "__main__":
    main()
