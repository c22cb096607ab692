"""Capture a jax.profiler trace of the fused step, dump per-op stats, and
map the hot HLO ops back to source via the compiled module's metadata.

Usage: python scripts/trace_step.py [n_particles] [n_top]
Writes /tmp/nk_trace (profile), /tmp/nk_hlo.txt (optimized HLO), and prints
a per-step ms table annotated with op_name/source metadata.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def _per_op_table(tdir):
    import collections

    fs = sorted(glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz"))
    if not fs:
        return None, None
    d = json.load(gzip.open(fs[-1]))
    events = d["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], ""):
            agg[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    return agg, cnt


def _hlo_meta(hlo_text):
    """Map op name -> metadata string (op_name=..., source_file=...)."""
    meta = {}
    for m in re.finditer(
        r"%?([\w.\-]+\.\d+) = [^\n]*metadata=\{([^}]*)\}", hlo_text
    ):
        meta[m.group(1)] = m.group(2)
    return meta


def main():
    from nanokappa_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from scripts.profile_step import build

    n = float(sys.argv[1]) if len(sys.argv) > 1 else 1e6
    n_top = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    mesh_pts = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    res_gen = sys.argv[4] if len(sys.argv) > 4 else "constant"
    if res_gen == "wire":  # event-bound nanowire config (profile_step.build_wire)
        from scripts.profile_step import build_wire

        run, state = build_wire(n, mesh_pts, n_inner=20)
    else:
        run, state = build(n, mesh_pts, n_inner=20, res_gen=res_gen)

    hlo = ""
    if hasattr(run, "lower"):
        lowered = run.lower(state)
        compiled = lowered.compile()
        hlo = compiled.as_text()
        with open("/tmp/nk_hlo.txt", "w") as f:
            f.write(hlo)
        print(f"HLO dumped ({len(hlo)} chars)", flush=True)
    else:
        # big-table configs return a plain wrapper around the jitted
        # parameterized program (sim/step.py _parameterize_tables); the
        # per-op table still works, only source metadata is skipped
        print("parameterized-tables runner (no .lower); skipping HLO dump",
              flush=True)

    state, _ = run(state)
    state, _ = run(state)
    jax.block_until_ready(state.packed)

    tdir = "/tmp/nk_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(3):
            state, _ = run(state)
        jax.block_until_ready(state.packed)

    agg, cnt = _per_op_table(tdir)
    if agg is None:
        print("no trace events found", flush=True)
        return
    meta = _hlo_meta(hlo)
    n_steps = 60  # 3 runs x n_inner=20
    print(f"== per-step ms (top {n_top}, {n_steps} steps) ==")
    for name, us in agg.most_common(n_top):
        md = meta.get(name, "")
        src = ""
        m = re.search(r'op_name="([^"]*)"', md)
        if m:
            src = m.group(1)[:90]
        m = re.search(r'source_file="([^"]*)"', md)
        if m:
            src += "  [" + m.group(1).split("/")[-1]
            m2 = re.search(r"source_line=(\d+)", md)
            src += f":{m2.group(1)}]" if m2 else "]"
        print(f"{us / 1000 / n_steps:8.3f}  x{cnt[name]:4d}  {name}  {src}")


if __name__ == "__main__":
    main()
