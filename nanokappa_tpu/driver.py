"""Host-side simulation driver: assembly, main loop, convergence machinery.

The reference wires its classes together in nanokappa.py:71-107 and stops on
iteration count, convergence residue, or wall-clock limit
(nanokappa.py:91-98). The residue machinery mirrors
Visualisation.read_convergence + Population.update_residue
(classes/Visualisation.py:122-212, classes/Population.py:1771-1839): rolling
means/stds over the last n_mean convergence datapoints; the maximum relative
change of every monitored mean must stay below conv_crit for
conv_count_min consecutive checks.
"""

from __future__ import annotations

import dataclasses
import os
import time
from collections import deque

import numpy as np
import jax

from nanokappa_tpu.io import writers
from nanokappa_tpu.io.config import write_arguments_file
from nanokappa_tpu.geometry.domain import BC, Domain, build_domain
from nanokappa_tpu.geometry.device import build_device_geometry
from nanokappa_tpu.material import load_material
from nanokappa_tpu.material.tables import Material, bose_einstein
from nanokappa_tpu.sim.boundary_tables import build_boundary_tables
from nanokappa_tpu.sim.kappa import kappa_connections, kappa_slice
from nanokappa_tpu.sim.reservoir import build_reservoir_tables
from nanokappa_tpu.sim.state import SimParams, init_state, particle_count
from nanokappa_tpu.sim.step import build_step, reset_ledgers
from nanokappa_tpu.constants import EVPSA2_IN_WM2


def parse_max_time(s: str) -> float:
    """'D-HH:MM:SS' -> seconds; 0-00:00:00 disables (returns inf)."""
    days, hms = s.split("-") if "-" in s else ("0", s)
    h, m, sec = (int(x) for x in hms.split(":"))
    total = int(days) * 86400 + h * 3600 + m * 60 + sec
    return float("inf") if total == 0 else float(total)


N_DT_TO_CONV = 10  # timesteps per convergence datapoint (Population.py:41)
CONV_BATCH = 10  # datapoints per host sync (device-batched convergence)


def material_from_args(args) -> Material:
    """Load the material exactly as the driver does (shared with the offline
    postprocess entry).

    Multi-material runs are rejected loudly instead of silently using
    material 0: the reference ships the same path as dead code ("this
    snippet is useless at the current state",
    /root/reference/nanokappa.py:74-87), so parity is a clear error, not a
    half-wired feature."""
    sv_mat = [str(x) for x in getattr(args, "subvol_material", []) or []]
    if len(set(sv_mat)) > 1 or len(args.mat_folder) > 1:
        raise SystemExit(
            "ERROR: multi-material simulations (--subvol_material with "
            "distinct indices / multiple --mat_folder entries) are not "
            "supported — the reference's multi-material path is dead code "
            "too (nanokappa.py:74-87). Run one material per simulation."
        )
    rotation = None
    if len(args.mat_rotation) >= 4:
        rotation = (
            [float(x) for x in args.mat_rotation[1:4]],
            str(args.mat_rotation[4]) if len(args.mat_rotation) > 4 else "xyz",
        )
    return load_material(
        args.mat_folder[0],
        args.hdf_file[0],
        args.poscar_file[0],
        isotope_scattering=0 in list(args.isotope_scat),
        rotation=rotation,
    )


def domain_from_args(args) -> Domain:
    """Build the domain exactly as the driver does (shared with the offline
    postprocess entry)."""
    rot = None
    gr = list(args.geo_rotation)
    if len(gr) >= 4 and any(float(x) != 0 for x in gr[:-1]):
        rot = ([float(x) for x in gr[:-1]], str(gr[-1]))
    return build_domain(
        geometry=str(args.geometry[0]).replace("cuboid", "box"),
        dimensions=[float(d) for d in args.dimensions],
        scale=[float(s) for s in args.scale],
        rotation=rot,
        subvolumes=tuple(args.subvolumes),
        bound_pos=tuple(args.bound_pos),
        bound_cond=tuple(args.bound_cond),
        bound_values=tuple(args.bound_values),
        connect_pos=tuple(args.connect_pos),
        volume_algo=str(getattr(args, "subvol_volume_algo", ["mc"])[0]),
    )


class Simulation:
    """Everything assembled from parsed args; run() is the main loop."""

    def __init__(self, args, material: Material | None = None):
        self.args = args
        self.folder = args.results_folder
        os.makedirs(self.folder, exist_ok=True)
        write_arguments_file(args, self.folder)

        # --- material -------------------------------------------------------
        if material is None:
            rotation = None
            if len(args.mat_rotation) >= 4:
                rotation = (
                    [float(x) for x in args.mat_rotation[1:4]],
                    str(args.mat_rotation[4]) if len(args.mat_rotation) > 4 else "xyz",
                )
            material = load_material(
                args.mat_folder[0],
                args.hdf_file[0],
                args.poscar_file[0],
                isotope_scattering=0 in list(args.isotope_scat),
                rotation=rotation,
            )
        self.material = material

        # --- geometry -------------------------------------------------------
        rot = None
        gr = list(args.geo_rotation)
        if len(gr) >= 4 and any(float(x) != 0 for x in gr[:-1]):
            rot = ([float(x) for x in gr[:-1]], str(gr[-1]))
        self.domain = build_domain(
            geometry=str(args.geometry[0]).replace("cuboid", "box"),
            dimensions=[float(d) for d in args.dimensions],
            scale=[float(s) for s in args.scale],
            rotation=rot,
            subvolumes=tuple(args.subvolumes),
            bound_pos=tuple(args.bound_pos),
            bound_cond=tuple(args.bound_cond),
            bound_values=tuple(args.bound_values),
            connect_pos=tuple(args.connect_pos),
        )
        self.geo = build_device_geometry(self.domain)

        # --- parameters -----------------------------------------------------
        n_p, rho = particle_count(tuple(args.particles), material, self.domain)
        self.n_p_target = n_p
        n_shards = int(args.n_shards[0]) or 1
        res_T = self.domain.res_values[
            self.domain.bound_cond[self.domain.res_facets] == BC.TEMPERATURE
        ]
        t_ref = (
            float(res_T.mean())
            if str(args.reference_temp[0]) == "local" and len(res_T)
            else (300.0 if str(args.reference_temp[0]) == "local" else float(args.reference_temp[0]))
        )
        from nanokappa_tpu.sim.state import round_pool_cap

        n_cap = round_pool_cap(int(n_p * float(args.pool_margin[0])), n_shards)
        dt = float(args.timestep[0])
        # autosize c_max so the per-(r,m) deterministic generation loop can
        # materialise the highest entry rate (floor(max ep) + 1 fractional);
        # without this a coarse mode table at high particle density would
        # clip injections (now also counted into `lost`)
        self.rtab = build_reservoir_tables(material, self.domain, dt, rho)
        from nanokappa_tpu.sim.reservoir import autosize_c_max

        from nanokappa_tpu.sim.reservoir import autosize_inj_cap

        c_max = autosize_c_max(self.rtab, n_shards) if str(
            args.reservoir_gen[0]
        ) in ("constant", "fixed_rate") else 3
        self.params = SimParams(
            dt=dt,
            n_cap=n_cap,
            inj_cap=autosize_inj_cap(self.rtab, n_shards),
            c_max=c_max,
            energy_normal=str(args.energy_normal[0]),
            temp_interp=str(args.temp_interp[0]),
            res_gen=str(args.reservoir_gen[0]),
            scat_model=str(args.bound_scat[0]),
            particle_density=rho,
            n_active_modes=material.n_active_modes,
            t_reference=t_ref,
            n_shards=n_shards,
            evt_cap=int(getattr(args, "evt_cap", [0])[0]),
        )

        # --- tables ---------------------------------------------------------
        self.btab = build_boundary_tables(material, self.domain, self.params.scat_model)
        from nanokappa_tpu.sim.boundary_tables import write_specular_correspondences

        write_specular_correspondences(self.btab, material, self.domain, self.folder)
        self.mtab = material.device_tables()

        # --- state ----------------------------------------------------------
        part_dist = str(args.part_dist[0])
        kw = {}
        if part_dist not in ("random_domain", "center_domain", "random_subvol", "center_subvol"):
            modes_qj, positions, occupation = writers.read_particle_data(part_dist)
            kw = dict(
                positions=positions,
                modes=material.mode_index(modes_qj[:, 0], modes_qj[:, 1]).astype(np.int32),
                occupation=occupation,
            )
            n_p = len(occupation)
            part_dist = "random_domain"
        self.state = init_state(
            material, self.domain, self.geo, self.params, n_p,
            temp_dist=str(args.temp_dist[0]),
            part_dist=part_dist,
            subvol_temp=[float(t) for t in args.subvol_temp],
            seed=int(args.seed[0]),
            empty_subvols=[int(i) for i in args.empty_subvols],
            btab=self.btab,
            **kw,
        )

        # kappa path (reference --path_points / snap_path,
        # classes/Geometry.py:1070-1188)
        self.kappa_path = None
        if len(args.path_points) > 1:
            pts = np.asarray(args.path_points[1:], dtype=float).reshape(-1, 3)
            if args.path_points[0] == "relative":
                pts = pts * np.ptp(self.domain.bounds, axis=0) + self.domain.bounds[0]
            self.kappa_path = self.domain.find_path(pts)
            self.path_cons = self.domain.path_connections(self.kappa_path)

        # --- step function --------------------------------------------------
        # convergence datapoints are BATCHED on device: one host sync per
        # CONV_BATCH datapoints (default 10 = 100 timesteps) instead of per
        # datapoint — through a remote-TPU tunnel each sync costs ~0.6 s
        # while the device runs a 10-step block in ~100 ms. A 1-datapoint
        # tail runner is built lazily for iteration counts that do not
        # divide by the batch. Row cadence in convergence.txt is unchanged.
        self._mesh = None
        if n_shards > 1:
            from nanokappa_tpu.parallel import (
                build_sharded_step, make_particle_mesh, shard_state,
            )

            self._mesh = make_particle_mesh(n_shards)
            self.state = shard_state(self.state, self._mesh)
            self.run_steps = build_sharded_step(
                self.geo, self.mtab, self.btab, self.rtab, self.params,
                self._mesh, n_inner=N_DT_TO_CONV, n_outer=CONV_BATCH,
            )
        else:
            self.run_steps = build_step(
                self.geo, self.mtab, self.btab, self.rtab, self.params,
                n_inner=N_DT_TO_CONV, n_outer=CONV_BATCH,
            )
        self._run_tail = None

        # v2 (fused) states carry one PENDING deferred RTA application;
        # finalize() applies it on a copy before any particle-data write
        from nanokappa_tpu.sim.fused import make_finalize, v2_eligible

        self._finalize = (
            make_finalize(self.geo, self.mtab, self.params, btab=self.btab)
            if v2_eligible(self.geo, self.params)
            else (lambda s: s)
        )

        # --- convergence machinery ------------------------------------------
        self.conv_crit = float(args.conv_crit[0])
        self.conv_count_min = int(args.conv_crit[1])
        self.n_mean = int(args.n_mean[0])
        self.window: deque = deque(maxlen=self.n_mean)
        self.conv_count = 0
        self.finish_sim = False
        self.max_residue = 1.0
        self.max_residue_qt = "none"
        self.old_mean = None
        self.current_timestep = 0
        self.res_T_pad = res_T if len(res_T) >= 2 else np.array([300.0, 300.0])

        # escape self-healing pool (reference contains_check,
        # classes/Population.py:1712-1722)
        import jax.numpy as jnp
        from nanokappa_tpu.sim.repair import make_contains_check

        pool = self.domain.mesh.sample_volume(1 << 13, np.random.default_rng(1))
        self.contains_check = make_contains_check(
            self.geo, jnp.asarray(pool, dtype=jnp.float32), self.params.dt
        )
        self._repair_key = jax.random.PRNGKey(int(args.seed[0]) + 777)
        self.n_escaped_total = 0

        self.conv_writer = writers.ConvergenceWriter(
            self.folder,
            self.domain.n_of_subvols,
            self.domain.n_of_reservoirs,
            self.domain.subvol_type,
            self.domain.subvol_connections,
        )

    # ------------------------------------------------------------------ run

    def _rebuild_step(self, evt_cap: int):
        """Rebuild the jitted step programs with a larger event buffer
        (frozen-storm adaptation). The SimState pytree is unchanged — only
        internal buffer widths grow — so the running state carries over;
        the cost is one recompile of the batched runner (and lazily of the
        tail runner, which is dropped here and rebuilt on demand)."""
        import dataclasses

        from nanokappa_tpu.sim.fused import make_finalize, v2_eligible

        self.params = dataclasses.replace(self.params, evt_cap=evt_cap)
        if self._mesh is not None:
            from nanokappa_tpu.parallel import build_sharded_step

            self.run_steps = build_sharded_step(
                self.geo, self.mtab, self.btab, self.rtab, self.params,
                self._mesh, n_inner=N_DT_TO_CONV, n_outer=CONV_BATCH,
            )
        else:
            self.run_steps = build_step(
                self.geo, self.mtab, self.btab, self.rtab, self.params,
                n_inner=N_DT_TO_CONV, n_outer=CONV_BATCH,
            )
        self._run_tail = None
        is_v2 = v2_eligible(self.geo, self.params)
        if not is_v2:
            from nanokappa_tpu.sim.fused import v2_fallback_reason

            reason = v2_fallback_reason(self.geo, self.params)
            print(
                f"NOTE: running the v1 XLA step (~10x slower than the "
                f"fused kernel path): {reason}",
                flush=True,
            )
        self._finalize = (
            make_finalize(self.geo, self.mtab, self.params, btab=self.btab)
            if is_v2
            else (lambda s: s)
        )

    def _observe(self, out):
        """Convert StepOutputs into one convergence datapoint (host)."""
        dom, args = self.domain, self.args
        # ONE batched device->host transfer: per-array np.asarray costs a
        # full round trip each (hundreds of ms through a remote-TPU tunnel)
        out = jax.device_get(out)
        T = np.asarray(out.T_sv, dtype=float)
        E = np.asarray(out.E_sv, dtype=float)
        phi = np.asarray(out.phi_sv, dtype=float)
        Np = np.asarray(out.Np_sv, dtype=int)
        # reservoir ledgers: normalise like adjust_reservoir_balance
        # (classes/Population.py:1685-1693)
        mat = self.material
        dens = self.params.particle_density
        areas = dom.mesh.facet_areas[dom.res_facets]
        eb = np.asarray(out.res_energy_balance, dtype=float)
        hf = np.asarray(out.res_heat_flux, dtype=float)
        scale = mat.n_active_modes / (dens * self.params.dt * N_DT_TO_CONV)
        eb = eb * scale / (mat.n_qpoints * mat.volume_unitcell)
        hf = hf * (scale / np.maximum(areas, 1e-300))[:, None] / (
            mat.n_qpoints * mat.volume_unitcell
        ) * EVPSA2_IN_WM2

        row = dict(T=T, E=E, phi=phi, Np=Np, eb=eb, hf=hf,
                   total_energy=float(out.total_energy),
                   N_p=int(out.N_p), lost=int(out.lost),
                   lost_split=np.asarray(out.lost_split, dtype=int).reshape(-1),
                   frozen=int(out.frozen))
        if dom.subvol_type == "slice":
            ksv, ktot = kappa_slice(
                T, phi, Np, self.res_T_pad,
                float(np.ptp(dom.bounds[:, dom.slice_axis])), dom.slice_axis,
            )
            row["kappa_sv"] = ksv
            row["kappa_total"] = ktot
        else:
            row["kappa_con"] = kappa_connections(
                T, phi, dom.subvol_center, dom.subvol_connections
            )
        return row

    def _write_convergence(self, row):
        self.conv_writer.write_row(
            self.current_timestep,
            self.current_timestep * self.params.dt,
            row["total_energy"],
            row["eb"], row["hf"], row["N_p"],
            row["T"], row["E"], row["phi"], row["Np"],
            kappa_sv=row.get("kappa_sv"),
            kappa_total=row.get("kappa_total"),
            kappa_con=row.get("kappa_con"),
        )

    def _update_residue(self):
        """Rolling means over the window; residue vs previous check
        (classes/Population.py:1797-1830)."""
        dom = self.domain
        W = list(self.window)
        T = np.stack([w["T"] for w in W])
        eb = np.stack([w["eb"] for w in W])
        if dom.subvol_type == "slice":
            phi = np.stack([w["phi"][:, dom.slice_axis] for w in W])
            k = np.stack([w["kappa_sv"] for w in W])
            names = (
                [f"T_{i}" for i in range(T.shape[1])]
                + [f"phi_{i}" for i in range(phi.shape[1])]
                + [f"en_res_{i}" for i in range(eb.shape[1])]
                + [f"k_{i}" for i in range(k.shape[1])]
            )
        else:
            phi = np.stack([w["phi"].reshape(-1) for w in W])
            k = np.stack([w["kappa_con"] for w in W])
            names = (
                [f"T_{i}" for i in range(T.shape[1])]
                + [f"phi_{i}" for i in range(phi.shape[1])]
                + [f"en_res_{i}" for i in range(eb.shape[1])]
                + [f"k_{i}" for i in range(k.shape[1])]
            )
        mean = np.concatenate(
            [T.mean(0), phi.mean(0), eb.mean(0), np.nanmean(k, axis=0)]
        )
        std = np.concatenate(
            [T.std(0), phi.std(0), eb.std(0), np.nanstd(k, axis=0)]
        )
        if self.old_mean is None:
            self.old_mean = np.ones_like(mean)
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            residue = np.abs((mean - self.old_mean) / self.old_mean)
        residue = np.where(std > np.abs(mean), 0.0, residue)
        self.max_residue = float(np.nanmax(residue))
        self.max_residue_qt = names[int(np.nanargmax(np.nan_to_num(residue)))]
        self.old_mean = mean
        writers.append_residue(self.folder, residue)

        if self.max_residue < self.conv_crit:
            self.conv_count += 1
        else:
            self.conv_count = 0
        if self.conv_count >= self.conv_count_min:
            self.finish_sim = True
        return mean, std

    def run(self, verbose: bool = True, profile_dir: str | None = None):
        from nanokappa_tpu.io.trace import PhaseTimer, trace

        args = self.args
        iterations = int(args.iterations[0])
        max_seconds = parse_max_time(str(args.max_sim_time[0]))
        t_start = time.time()
        last_row = None
        self.timer = timer = PhaseTimer()
        profiled = False
        while (
            self.current_timestep < iterations
            and not self.finish_sim
            and (time.time() - t_start) < max_seconds
        ):
            remaining = iterations - self.current_timestep
            if remaining >= N_DT_TO_CONV * CONV_BATCH:
                runner, nb = self.run_steps, CONV_BATCH
            else:
                # tail: iteration counts not divisible by the batch finish on
                # a 1-datapoint runner (compiled on first need)
                if self._run_tail is None:
                    if self._mesh is not None:
                        from nanokappa_tpu.parallel import build_sharded_step

                        self._run_tail = build_sharded_step(
                            self.geo, self.mtab, self.btab, self.rtab,
                            self.params, self._mesh, n_inner=N_DT_TO_CONV,
                        )
                    else:
                        self._run_tail = build_step(
                            self.geo, self.mtab, self.btab, self.rtab,
                            self.params, n_inner=N_DT_TO_CONV,
                        )
                runner, nb = self._run_tail, 1
            with trace(profile_dir if (profile_dir and not profiled and self.current_timestep > 0) else None):
                with timer.phase("device_step"):
                    self.state, outs = runner(self.state)
                    jax.block_until_ready(outs.T_sv)
                profiled = profiled or self.current_timestep > 0
            with timer.phase("host_observe"):
                # ONE device->host transfer for the whole batch
                outs_host = jax.device_get(outs)
                for i in range(nb):
                    out = (
                        outs_host if nb == 1
                        else jax.tree.map(lambda x: x[i], outs_host)
                    )
                    self.current_timestep += N_DT_TO_CONV
                    row = self._observe(out)
                    self.window.append(row)
                    self._write_convergence(row)
                    last_row = row
            if nb == 1:
                # batched blocks reset their ledgers on device
                self.state = reset_ledgers(self.state)
            if self.current_timestep % 100 == 0:
                # frozen-storm detection: `frozen` counts boundary events
                # postponed because the event buffer overflowed. A sustained
                # storm (> 1% of the pool per 100 steps) means evt_cap is
                # undersized for this geometry — ADAPT: double the event
                # buffer and rebuild the step program (the state pytree is
                # unchanged, only the internal buffer widths grow, so the
                # running state carries over; bounded to 3 regrows / n_cap//4
                # so a pathological config cannot recompile forever).
                frozen_now = int(last_row["frozen"]) if last_row else 0
                d_frozen = frozen_now - getattr(self, "_frozen_prev", 0)
                self._frozen_prev = frozen_now
                if d_frozen > 0.01 * self.params.n_cap:
                    from nanokappa_tpu.sim.fused import (
                        autosize_evt_cap, mirror_eligible,
                    )

                    cur = self.params.evt_cap or autosize_evt_cap(
                        self.geo, self.mtab, self.params,
                        mirror_eligible(
                            self.geo, self.btab, self.params, self.mtab
                        ),
                        self.params.n_cap // max(1, self.params.n_shards),
                        btab=self.btab,
                    )
                    grown = getattr(self, "_evt_regrows", 0)
                    new_cap = min(2 * cur, self.params.n_cap // 4)
                    if grown < 3 and new_cap > cur:
                        self._evt_regrows = grown + 1
                        print(
                            f"NOTE: {d_frozen} boundary events frozen in "
                            f"the last 100 steps (event buffer overflow) — "
                            f"growing evt_cap {cur} -> {new_cap} and "
                            f"rebuilding the step (regrow "
                            f"{self._evt_regrows}/3)",
                            flush=True,
                        )
                        self._rebuild_step(evt_cap=new_cap)
                    else:
                        print(
                            f"WARNING: {d_frozen} boundary events frozen in "
                            f"the last 100 steps (event buffer overflow at "
                            f"evt_cap {cur}) — rerun with a larger evt_cap",
                            flush=True,
                        )
                # lost-particle telemetry: name the mechanism whenever the
                # population actually loses lanes (silent loss was round-3
                # weak point 9 — a too-small pool or a defective geometry
                # only showed up as a slow N_p decay)
                if last_row is not None and "lost_split" in last_row:
                    ls_now = last_row["lost_split"]
                    d_lost = ls_now - getattr(
                        self, "_lost_prev", np.zeros_like(ls_now)
                    )
                    self._lost_prev = ls_now.copy()
                    for d, name, hint in zip(
                        d_lost,
                        ("capacity drops (injection clip / pool full)",
                         "k_max-stuck quarantined lanes",
                         "defective lanes (ray cast found no boundary)"),
                        ("increase --particles margin or pool capacity",
                         "increase k_max (deep reflection chains)",
                         "check the geometry for open seams"),
                    ):
                        if d > 0:
                            print(
                                f"WARNING: lost {int(d)} particles in the "
                                f"last 100 steps to {name} — {hint}",
                                flush=True,
                            )
                # escape self-healing, sharded or not: the check is pure
                # elementwise jnp over the particle axis, so jit propagates
                # the state's "p" shardings through it (reference heals
                # unconditionally, classes/Population.py:1712-1722)
                self._repair_key, k = jax.random.split(self._repair_key)
                self.state, n_esc = self.contains_check(self.state, k)
                self.n_escaped_total += int(n_esc)
                self._update_residue()
                # periodic checkpoint + figures (reference run_timestep,
                # classes/Population.py:1729-1735)
                self.write_final_state()
                if len(self.args.fig_plot):
                    try:
                        from nanokappa_tpu.visual import runtime_figures

                        runtime_figures(self)
                    except Exception:
                        pass
                if verbose:
                    info = "Timestep {:>5d} - max residue: {:>9.3e} ({:<9s}) [".format(
                        self.current_timestep, self.max_residue, self.max_residue_qt
                    )
                    for t in row["T"]:
                        info += " {:>7.3f}".format(t)
                    info += " ]"
                    print(info, flush=True)
        self.write_final_state()
        if verbose:
            print(timer.report(), flush=True)
        return last_row

    # -------------------------------------------------------------- outputs

    def occupation_of(self, state) -> np.ndarray:
        # dead pool lanes carry arbitrary bits in the mode column — clip
        # before the table lookup (callers mask by `alive` afterwards; a
        # garbage id outside [-M, M) would raise in numpy fancy indexing)
        mode = np.clip(np.asarray(state.mode), 0, self.material.n_modes - 1)
        omega = self.material.omega.reshape(-1)[mode]
        return np.asarray(state.dev, dtype=float) + bose_einstein(
            self.params.t_reference, omega
        )

    def write_final_state(self):
        # fused (v2) states carry one pending deferred-RTA application; apply
        # it on a copy so particle_data.txt matches the reference's
        # end-of-step occupations exactly (resume parity)
        s = self._finalize(self.state)
        alive = np.asarray(s.alive)
        modes = np.asarray(s.mode)[alive]
        q, j = self.material.mode_to_qj(modes)
        writers.write_particle_data(
            self.folder,
            np.stack([q, j], axis=1),
            np.asarray(s.pos)[alive],
            self.occupation_of(s)[alive],
            self.args.hdf_file, self.args.poscar_file,
        )
        if len(self.window) == 0:
            return
        W = list(self.window)
        T = np.stack([w["T"] for w in W])
        phi = np.stack([w["phi"] for w in W])
        dom = self.domain
        if dom.subvol_type == "slice":
            k = np.stack([w["kappa_sv"] for w in W])
            writers.write_subvolumes(
                self.folder, dom.subvol_center, dom.subvol_volume,
                T.mean(0), T.std(0), phi.mean(0), phi.std(0),
                np.nanmean(k, 0), np.nanstd(k, 0),
                self.args.hdf_file, self.args.poscar_file,
            )
        else:
            writers.write_subvolumes(
                self.folder, dom.subvol_center, dom.subvol_volume,
                T.mean(0), T.std(0), phi.mean(0), phi.std(0),
                None, None, self.args.hdf_file, self.args.poscar_file,
            )
            k = np.stack([w["kappa_con"] for w in W])
            con = dom.subvol_connections
            vec = dom.subvol_center[con[:, 1]] - dom.subvol_center[con[:, 0]]
            dT = T[:, con[:, 1]] - T[:, con[:, 0]]
            n = vec / np.linalg.norm(vec, axis=1, keepdims=True)
            phi_con = np.einsum(
                "wcj,cj->wc", (phi[:, con[:, 0]] + phi[:, con[:, 1]]) / 2, n
            )
            writers.write_subvol_connections(
                self.folder, con, vec, dT.mean(0), dT.std(0),
                phi_con.mean(0), phi_con.std(0), np.nanmean(k, 0), np.nanstd(k, 0),
                self.args.hdf_file, self.args.poscar_file,
            )
        if self.kappa_path is not None and dom.subvol_type != "slice":
            k = np.nanmean(np.stack([w["kappa_con"] for w in W]), axis=0)
            cons = self.path_cons
            centers = dom.subvol_center
            seg_L = np.array(
                [
                    np.linalg.norm(
                        centers[self.kappa_path[i + 1]] - centers[self.kappa_path[i]]
                    )
                    for i in range(len(self.kappa_path) - 1)
                ]
            )
            with np.errstate(divide="ignore", invalid="ignore"):
                # series thermal resistance along the snapped path
                k_path = seg_L.sum() / np.nansum(seg_L / np.abs(k[cons]))
            with open(os.path.join(self.folder, "kappa_path.txt"), "w") as f:
                f.write("# subvolume path: " + " ".join(map(str, self.kappa_path)) + "\n")
                f.write("# connection id, kappa [W/m K]\n")
                for ci in cons:
                    f.write(f"{ci}, {k[ci]:.6e}\n")
                f.write(f"# path kappa (series) = {k_path:.6e} W/m K\n")
