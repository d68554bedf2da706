"""XLA flag sweep for the resident encode: same program, different compiler knobs.

The int8/bf16 encode is bandwidth-bound by XLA's own cost accounting
(docs/BENCHMARKS.md) — fusion/VMEM scheduling knobs are the only lever left
that doesn't change the math.  Each setting runs bench_encode_variants in a
fresh subprocess (XLA_FLAGS is read at backend init, so in-process sweeping
is impossible) and reports the per-variant fps next to the baseline.

Expect most knobs to be neutral-or-worse; the value is the measurement.
Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_encode_flags.py

Measured 2026-08-18 on the tunnel-attached v5e: the axon XLA build FATALLY
rejects libtpu tuning flags (`Unknown flag in XLA_FLAGS:
--xla_tpu_scoped_vmem_limit_kib`) — no scoped-VMEM sweep is possible through
this platform plugin. Baseline re-confirmed at fast_int8=3110 /
model_bf16=2962 fps. The harness stays for real libtpu deployments, where
these flags exist.
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

SETTINGS = {
    "baseline": "",
    # 4x the default scoped-VMEM budget: lets XLA keep bigger fusion operands
    # resident (the encode's LN/softmax passes are HBM-bound)
    "vmem64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem32m": "--xla_tpu_scoped_vmem_limit_kib=32768",
}


def run(setting_name: str, flags: str, variants, batch: int, iters: int, passes: int):
    env = dict(os.environ)
    if flags:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        # flag-dependent programs must not cross-pollute the persistent cache
        env["JAX_COMPILATION_CACHE_DIR"] = f"/tmp/jax_tpu_cache_{setting_name}"
    cmd = [
        sys.executable, "-u", os.path.join(HERE, "bench_encode_variants.py"),
        "--variants", *variants, "--batches", str(batch),
        "--iters", str(iters), "--passes", str(passes),
    ]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=3600)
    results = {}
    for line in out.stdout.splitlines():
        try:
            rec = json.loads(line)
            results[rec["stage"]] = rec["fps"]
        except (json.JSONDecodeError, KeyError):
            continue
    if not results:
        print(f"[{setting_name}] FAILED rc={out.returncode}: {out.stderr[-500:]}")
    return results


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="*", default=["fast_int8", "model_bf16"])
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--settings", nargs="*", default=list(SETTINGS))
    args = ap.parse_args()

    table = {}
    for name in args.settings:
        table[name] = run(name, SETTINGS[name], args.variants, args.batch, args.iters, args.passes)
        print(json.dumps({"setting": name, "flags": SETTINGS[name], "fps": table[name]}), flush=True)

    base = table.get("baseline", {})
    for name, fps in table.items():
        if name == "baseline" or not base:
            continue
        rel = {v: round(fps[v] / base[v], 3) for v in fps if v in base and base[v]}
        print(json.dumps({"setting": name, "vs_baseline": rel}), flush=True)


if __name__ == "__main__":
    main()
