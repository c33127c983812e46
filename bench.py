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
    B, LX, LY = 32768, 29, 32
    sm = StateMachineParams.default_nucleotide()
    dtype = jnp.float32
    tables = pairhmm.PairHmmTables.from_params(sm, dtype=dtype)
    # several distinct batches so no runtime-level result caching can cheat
    batches = []
    for _ in range(4):
        pairs = [(rng.integers(0, 4, LX).astype(np.uint8),
                  rng.integers(0, 4, LY).astype(np.uint8)) for _ in range(B)]
        strands = rng.integers(0, 2, B).astype(np.int32)
        batches.append(pairhmm.make_batch(pairs, strands=strands))

    # warm up / compile
    out = pairhmm.forward_total(tables, batches[0])
    out.block_until_ready()

    # steady state: keep every output alive (so no execution can be elided)
    # and block once per window; median of 5 windows (the tunneled dev TPU
    # is shared and noisy).
    n_iter = 16
    rates = []
    for _ in range(5):
        t0 = time.perf_counter()
        outs = [pairhmm.forward_total(tables, batches[i % len(batches)])
                for i in range(n_iter)]
        outs[-1].block_until_ready()
        rates.append(B * n_iter / (time.perf_counter() - t0))
        for o in outs:
            o.block_until_ready()
    pairs_per_s = sorted(rates)[len(rates) // 2]
    sites_per_s = pairs_per_s / PAIRS_PER_SITE
    print(json.dumps({
        "metric": "phase het variant sites/s/chip (pair-HMM allele supports)",
        "value": round(sites_per_s, 1),
        "unit": "sites/s/chip",
        "vs_baseline": round(sites_per_s / BASELINE_SITES_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
