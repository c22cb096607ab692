"""Capture a jax.profiler trace of the fused step and dump per-op stats."""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    from nanokappa_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from scripts.profile_step import build

    n = float(sys.argv[1]) if len(sys.argv) > 1 else 1e6
    run, state = build(n, 8, n_inner=20)
    state, _ = run(state)
    state, _ = run(state)
    jax.block_until_ready(state.pos)

    tdir = "/tmp/nk_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(3):
            state, _ = run(state)
        jax.block_until_ready(state.pos)

    pbs = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", pbs, flush=True)
    if not pbs:
        return
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

        data, _ = rtd.xspace_to_tool_data(pbs, "hlo_stats", {})
        out = "/tmp/nk_trace/hlo_stats.json"
        mode = "wb" if isinstance(data, bytes) else "w"
        with open(out, mode) as f:
            f.write(data)
        print("wrote", out, flush=True)
    except Exception as e:
        print("hlo_stats failed:", e, flush=True)
        try:
            from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

            data, _ = rtd.xspace_to_tool_data(pbs, "framework_op_stats", {})
            out = "/tmp/nk_trace/op_stats.json"
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(out, mode) as f:
                f.write(data)
            print("wrote", out, flush=True)
        except Exception as e2:
            print("op_stats failed:", e2, flush=True)


if __name__ == "__main__":
    main()
