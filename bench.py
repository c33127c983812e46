"""Benchmark: batched pair-HMM allele-support kernel throughput on one chip,
reported as heterozygous variant sites/s/chip for the `margin phase`
workload.

Workload model (matches the phase hot loop, SURVEY.md §3.4): every het site
scores ~(2 alleles x maxDepth=32 reads) = 64 dense pair-HMM forwards over
~29x32 symbol pairs (12 bp reference expansion + allele vs read substring).

Baseline (BASELINE.md): whole-genome phase of 75x ONT takes 80 min on 64
CPU threads; at ~2.0M phased het sites that is ~417 sites/s for the whole
64-thread host.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_SITES_PER_S = 2_000_000 / (80 * 60)  # 64-thread CPU reference host
PAIRS_PER_SITE = 64  # 2 alleles x 32 reads (maxDepth from haplotag params)


def main():
    import jax
    import jax.numpy as jnp
    from margin_tpu.ops import pairhmm
    from margin_tpu.params import StateMachineParams

    rng = np.random.default_rng(0)
    B, LX, LY = 8192, 29, 32
    sm = StateMachineParams.default_nucleotide()
    dtype = jnp.float32
    tables = pairhmm.PairHmmTables.from_params(sm, dtype=dtype)
    pairs = [(rng.integers(0, 4, LX).astype(np.uint8),
              rng.integers(0, 4, LY).astype(np.uint8)) for _ in range(B)]
    strands = rng.integers(0, 2, B).astype(np.int32)
    batch = pairhmm.make_batch(pairs, strands=strands)

    # warm up / compile
    out = pairhmm.forward_total(tables, batch)
    out.block_until_ready()

    # steady state
    n_iter = 10
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = pairhmm.forward_total(tables, batch)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    pairs_per_s = B * n_iter / dt
    sites_per_s = pairs_per_s / PAIRS_PER_SITE
    print(json.dumps({
        "metric": "phase het variant sites/s/chip (pair-HMM allele supports)",
        "value": round(sites_per_s, 1),
        "unit": "sites/s/chip",
        "vs_baseline": round(sites_per_s / BASELINE_SITES_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
