"""Device-op profile of the production sampling chain.

Captures a `jax.profiler` trace of the shipped `make_jit_sampler` program
(works through the axon tunnel) and aggregates TensorCore op durations
from the chrome-trace JSON, attributing each HLO op to a per-1000-step
cost — the op-level accounting VERDICT r4 asked for.

    python scripts/chain_profile.py [--steps 1000] [--out artifacts/...]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, ".")


def capture(steps: int):
    import jax
    import jax.numpy as jnp

    from sin3dm_tpu.core.compile_cache import enable_compilation_cache
    from sin3dm_tpu.diffusion.gaussian import DiffusionConfig
    from sin3dm_tpu.diffusion.sampling import (make_jit_sampler,
                                               sample_index_keys)
    from sin3dm_tpu.diffusion.schedule import make_schedule
    from sin3dm_tpu.models.unet import UNetConfig, init_unet, unet_apply

    enable_compilation_cache()
    tables = {k: jnp.asarray(v)
              for k, v in make_schedule("linear",
                                        steps).tables_f32().items()}
    ucfg = UNetConfig(compute_dtype=jnp.bfloat16, fast_norm=True,
                      fused_conv=jax.default_backend() != "cpu")
    params = init_unet(jax.random.PRNGKey(0), ucfg)
    sampler = make_jit_sampler(lambda p, x, t: unet_apply(p, ucfg, x, t),
                               tables, DiffusionConfig(), params=params)
    keys = sample_index_keys(jax.random.PRNGKey(7), 0, 1)
    out = sampler(keys, 1, 12, (92, 128, 92))  # compile + warm
    jax.block_until_ready(out)

    d = tempfile.mkdtemp(prefix="chainprof")
    with jax.profiler.trace(d):
        out = sampler(keys, 1, 12, (92, 128, 92))
        jax.block_until_ready(out)
    return d


def aggregate(trace_dir: str, steps: int, out_path: str):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no trace json under {trace_dir}")
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]

    # device lanes: pid whose process_name mentions TPU/TensorCore;
    # fall back to the pid with the largest total event time that is not
    # the python host threads
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    device_pids = {pid for pid, n in names.items()
                   if "TPU" in n or "/device" in n.lower()
                   or "TensorCore" in n}
    if not device_pids:
        totals = collections.Counter()
        for e in events:
            if e.get("ph") == "X" and "dur" in e:
                totals[e["pid"]] += e["dur"]
        host_pids = {pid for pid, n in names.items() if "python" in n.lower()}
        for pid in host_pids:
            totals.pop(pid, None)
        if totals:
            device_pids = {totals.most_common(1)[0][0]}
    print(f"process lanes: { {pid: names.get(pid, '?') for pid in names} }",
          file=sys.stderr)
    print(f"using device pids: {device_pids}", file=sys.stderr)

    per_op = collections.Counter()
    calls = collections.Counter()
    total = 0.0
    for e in events:
        if (e.get("ph") == "X" and e.get("pid") in device_pids
                and "dur" in e):
            name = e["name"]
            per_op[name] += e["dur"]
            calls[name] += 1
            total += e["dur"]

    lines = [f"total device time: {total / 1e6:.4f} s over {steps} steps "
             f"({total / steps:.2f} us/step)"]
    lines.append(f"{'us/step':>9}  {'pct':>5}  {'calls':>7}  op")
    for name, dur in per_op.most_common(60):
        lines.append(f"{dur / steps:9.2f}  {100 * dur / total:5.1f}  "
                     f"{calls[name]:7d}  {name[:110]}")
    text = "\n".join(lines)
    print(text)
    if out_path:
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            f.write(text + "\n")
        print(f"\nwritten to {out_path}", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--out", default="artifacts/chain_profile_r5.txt")
    args = ap.parse_args()
    d = capture(args.steps)
    aggregate(d, args.steps, args.out)


if __name__ == "__main__":
    main()
