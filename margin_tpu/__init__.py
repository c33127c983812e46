"""margin_tpu: a TPU-native long-read phasing + polishing engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
UCSC-nanopore-cgl/margin (`margin phase` read haplotagging / VCF phasing and
`margin polish` haploid+diploid assembly polishing).

Architecture (TPU-first, not a port):
  - Host side (numpy / C++): BAM/VCF/FASTA I/O, chunk geometry, graph surgery
    (POA augmentation, HMM tiling/merge schedules), stitching bookkeeping.
  - Device side (JAX / Pallas): batched dense+banded 3-state pair-HMM
    forward / forward-backward kernels (the allele-support and read-to-POA
    alignment engines), the read-partition forward-backward over het sites
    (bit-plane popcount emissions expressed as one-hot matmuls), and repeat
    count Bayesian inference.
  - Scale-out: genomic chunks are data-parallel shards over a
    `jax.sharding.Mesh`; chunk seams are resolved by a collective stitching
    pass (gathered read-id sets + boundary sequences).

Reference parity citations in docstrings use `file:line` into the upstream C
code (see SURVEY.md).
"""

__version__ = "0.1.0"

import os as _os


JAX_CACHE_DIR = None  # host-fingerprinted; set below


def _enable_jax_compilation_cache():
    """Persist compiled XLA executables across processes. Accelerator
    compiles through the dev tunnel cost minutes; the on-disk cache makes
    every run after the first start hot. Opt out with
    MARGIN_TPU_JAX_CACHE=0; relocate with MARGIN_TPU_JAX_CACHE=<dir>."""
    loc = _os.environ.get("MARGIN_TPU_JAX_CACHE", "")
    if loc == "0":
        return
    try:
        import hashlib
        import platform

        # configured via env (read by jax at its own import) rather than
        # jax.config.update: importing jax here would defeat the package's
        # lazy-jax policy — IPC worker processes never need it
        # key the cache by host CPU: the XLA:CPU AOT loader tolerates
        # machine-feature mismatches with warnings but can SIGSEGV when
        # deserializing an executable compiled on a different machine
        # (observed with +prefer-no-scatter AVX-512 artifacts)
        sig = platform.machine()
        try:
            with open("/proc/cpuinfo") as fh:
                for line in fh:
                    if line.startswith("flags"):
                        sig += hashlib.md5(line.encode()).hexdigest()[:10]
                        break
        except OSError:
            pass
        cache_dir = loc or _os.path.join(
            _os.path.expanduser("~"), ".cache", f"margin_tpu_jax_{sig}")
        global JAX_CACHE_DIR
        JAX_CACHE_DIR = cache_dir
        _os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
        _os.environ.setdefault(
            "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
        if "jax" in __import__("sys").modules:
            # jax already imported (e.g. the device-owning parent): the env
            # defaults above are too late — apply directly
            import jax
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
    except Exception:
        pass


_enable_jax_compilation_cache()

from margin_tpu.alphabet import Alphabet  # noqa: F401
from margin_tpu.rle import RleString  # noqa: F401
