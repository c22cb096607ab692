"""Command-line entry point (reference nanokappa.py).

Run e.g.:
    python -m nanokappa_tpu.cli -ff parameters.txt
"""

from __future__ import annotations

import os
import sys
import time
from datetime import datetime

from nanokappa_tpu.io.config import generate_results_folder, read_args


def main(argv=None):
    # offline postprocess: rebuild figures from a finished results folder and
    # exit — no simulation, no TPU (reference Visualisation.postprocess can
    # likewise rebuild from a folder alone, classes/Visualisation.py:214-254).
    # Parsed before the full parser so the required -pf/-hf flags aren't
    # demanded; everything else comes from the folder's arguments.txt.
    argv_l = list(sys.argv[1:] if argv is None else argv)
    for flag in ("--postprocess",):
        if flag in argv_l:
            folder = argv_l[argv_l.index(flag) + 1]
            from nanokappa_tpu.visual import postprocess_folder

            postprocess_folder(folder)
            return

    from nanokappa_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    args = read_args(argv)
    args = generate_results_folder(args)

    out_mode = args.output if isinstance(args.output, str) else args.output[0]
    redirect = out_mode == "file"
    if redirect:
        sys.stdout = open(os.path.join(args.results_folder, "output.txt"), "w", buffering=1)

    t0 = time.time()
    print("---------- o ----------- o ------------- o ------------")
    print("NANOKAPPA-TPU - phonon Monte Carlo BTE solver")
    print("Simulation started at", datetime.now().strftime("%Y-%m-%d %H:%M:%S"))
    print("Arguments file:", getattr(args, "from_file", "(command line)"))
    print("Results folder:", args.results_folder)
    print("---------- o ----------- o ------------- o ------------", flush=True)

    from nanokappa_tpu.driver import Simulation

    sim = Simulation(args)
    print(
        f"Material: {sim.material.name} — {sim.material.n_qpoints} q-points, "
        f"{sim.material.n_branches} branches, {sim.material.n_active_modes} active modes"
    )
    print(
        f"Domain: {sim.domain.mesh.n_facets} facets, "
        f"{sim.domain.n_of_subvols} subvolumes ({sim.domain.subvol_type}), "
        f"{sim.domain.n_of_reservoirs} reservoirs"
    )
    print(f"Particles: {sim.n_p_target} (pool capacity {sim.params.n_cap})", flush=True)

    try:
        from nanokappa_tpu.visual import plot_geometry, plot_material

        plot_material(sim.material, args.results_folder)
        plot_geometry(sim.domain, args.results_folder)
    except Exception as e:
        print("init plots failed:", e)

    sim.run(profile_dir=(str(args.profile[0]) or None))

    try:
        from nanokappa_tpu.visual import postprocess

        postprocess(sim)
    except Exception as e:  # plots must never kill a finished simulation
        print("postprocess failed:", e)

    dt = time.time() - t0
    print("---------- o ----------- o ------------- o ------------")
    print(f"Simulation finished at {datetime.now().strftime('%Y-%m-%d %H:%M:%S')} after {dt:.1f} s")
    print("Results in", args.results_folder)
    if redirect:
        sys.stdout.close()
        sys.stdout = sys.__stdout__


if __name__ == "__main__":
    main()
