"""CPU control arm for the A/B precision bisect.

The multi-seed study (MULTISEED.json) showed the ~1.5-2.2 dB parity-scene
PSNR deficit vs the reference is systematic, and the bisect showed f32
*storage* (tables/MLP) does not close it — pointing at the TPU MXU's
default single-pass-bf16 matmul precision, which quantizes every dot
(including the one-hot-matmul scatter gradients) even when operands are
f32. XLA:CPU has no such mode: matmuls are exact f32.

So running OUR side bit-identically (same code, same flags, same seed,
same threefry RNG stream — platform-independent) on CPU isolates the
platform matmul-precision axis with zero code changes: if the CPU run
reaches reference-level PSNR (~51 dB) where the TPU run capped at
~49.2-50.1, the precision-floor hypothesis is confirmed from a second,
independent direction (complementing the TPU `--matmul_precision highest`
arm, scripts/parity_bisect.py VARIANTS['prec_only']).

Usage: python scripts/parity_cpu.py [workdir] [seed]
  expects workdir/scene to exist (reuses the multiseed scene).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from parity_run import SHARED_FLAGS, run_ours, test_view_metrics


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity_ms"
    seed = sys.argv[2] if len(sys.argv) > 2 else "20211202"
    scene = os.path.join(work, "scene")
    assert os.path.isdir(scene), f"no scene at {scene}"
    out_path = os.path.join(work, "cpu_results.json")
    results = {}
    if os.path.isfile(out_path):
        results = json.load(open(out_path))

    # Inherited by the train subprocess. JAX_PLATFORMS=cpu alone does NOT
    # stop the environment's sitecustomize from registering the TPU-tunnel
    # PJRT plugin, and a wedged tunnel then hangs the child at backend init
    # (see tests/conftest.py) — popping the trigger var makes it pure-CPU.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

    # Two arms: bit-default flags (isolates matmul precision alone — CPU
    # default ≈ TPU default would exonerate the MXU), and f32 storage
    # (exact matmuls AND f32 tables/MLP: if only this arm reaches the
    # reference band, the deficit is bf16 quantization from *either*
    # source — each alone caps at its ~0.004 quantum ≈ 49.5 dB).
    arms = {
        f"cpu_default_{seed}": [],
        f"cpu_f32_{seed}": ["--gather_dtype", "float32", "--mlp_dtype", "float32"],
        # both CPU arms above still ran the fused compositing scan with its
        # analytic VJP (use_pallas=1, interpret mode on CPU) — its eps-guarded
        # backward is the one default that changes *gradient math* in exact
        # arithmetic, so ablate it
        f"cpu_nopallas_{seed}": ["--use_pallas", "0"],
        # quality gate for the coarse march probe (--occ_probe_ds): the
        # rays/s side runs on TPU (scripts/ab_probe.py); the PSNR-parity
        # side is platform-independent and can run here
        f"cpu_probe4_{seed}": ["--occ_probe_ds", "4"],
    }
    for name, flags in arms.items():
        if name in results:
            continue
        log = os.path.join(work, name)
        if not os.path.isfile(os.path.join(log, "transforms.json")):
            _orig = list(SHARED_FLAGS)
            SHARED_FLAGS.extend(["--seed", seed] + flags)
            try:
                dt = run_ours(scene, log)
                print(f"{name} run done in {dt:.0f}s", flush=True)
            finally:
                SHARED_FLAGS[:] = _orig
        results[name] = test_view_metrics(log, scene)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)

    print("\n== CPU-arm PSNR by frame ==")
    for name, m in sorted(results.items()):
        row = "  ".join(f"{fr}:{v['psnr']:6.2f}" for fr, v in sorted(m.items()))
        print(f"{name:20s} {row}")


if __name__ == "__main__":
    main()
