"""Post-processing plots (host, matplotlib), reference classes/Visualisation.py.

Generates the reference's figure set from the result files:
  * convergence of T / heat flux / N_p / energy / kappa per subvolume
    (plot_convergence_general, Visualisation.py:295-591)
  * reservoir energy balance (convergence_energy_balance, :668-717)
  * spectral kappa contribution per frequency band (flux_contribution, :593-666)
  * particle scatter figures colored by property (Population.plot_figures)
"""

from __future__ import annotations

import os

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from nanokappa_tpu.constants import HBAR  # noqa: E402


def set_theme(name: str = "white"):
    """Plot theme (reference --theme white|light|dark,
    classes/Visualisation.py:42-96)."""
    if name == "dark":
        plt.style.use("dark_background")
    else:
        plt.style.use("default")
        if name == "light":
            plt.rcParams["figure.facecolor"] = "#f4f4f4"
            plt.rcParams["axes.facecolor"] = "#f4f4f4"


def plot_material(mat, folder: str):
    """Material diagnostic plots at init (reference classes/Phonon.py:195-207,
    433-513): FBZ wavevectors, relaxation times tau(omega) at round-hundred
    temperatures, density of states per branch."""
    # FBZ scatter
    fig = plt.figure(figsize=(6, 5), dpi=120)
    ax = fig.add_subplot(projection="3d")
    k = mat.wavevectors
    ax.scatter(k[:, 0], k[:, 1], k[:, 2], s=1, c=(k**2).sum(axis=1))
    ax.set_xlabel(r"$k_x$"); ax.set_ylabel(r"$k_y$"); ax.set_zlabel(r"$k_z$")
    fig.suptitle(r"Wavevectors in FBZ, coloured by $|k|^2$")
    fig.tight_layout()
    fig.savefig(os.path.join(folder, "FBZ.png"))
    plt.close(fig)

    # relaxation times at multiples of 100 K
    T_all = mat.tau_T[mat.tau_T % 100 == 0]
    T_all = T_all[T_all > 0]
    fig, ax = plt.subplots(figsize=(5, 5), dpi=120)
    cmap = plt.get_cmap("jet")
    omega = mat.omega.reshape(-1)
    for i, T in enumerate(T_all):
        ti = int(np.searchsorted(mat.tau_T, T))
        tau = mat.tau[ti].reshape(-1)
        sel = tau > 0
        ax.scatter(omega[sel], tau[sel], s=1,
                   color=cmap(i / max(len(T_all) - 1, 1)), label=f"{T:.0f} K")
    ax.set_xlabel(r"$\omega$ [rad THz]")
    ax.set_ylabel(r"$\tau$ [ps]")
    ax.set_yscale("log")
    ax.legend(fontsize="small", markerscale=8)
    fig.tight_layout()
    fig.savefig(os.path.join(folder, "relaxation_times.png"))
    plt.close(fig)

    # density of states (stacked per branch, 200 bins)
    n_bins = 200
    intervals = np.linspace(0, mat.omega.max(), n_bins + 1)
    centers = (intervals[1:] + intervals[:-1]) / 2
    dos = np.stack(
        [np.histogram(mat.omega[:, b], bins=intervals)[0] for b in range(mat.n_branches)]
    ) / (intervals[1] - intervals[0])
    fig, ax = plt.subplots(figsize=(5, 5), dpi=120)
    ax.stackplot(centers, dos, labels=[f"Branch {b}" for b in range(mat.n_branches)],
                 step="pre")
    ax.set_xlabel(r"$\omega$ [rad THz]")
    ax.set_ylabel(r"$g(\omega)$ [THz$^{-1}$]")
    ax.legend(fontsize="small")
    fig.tight_layout()
    fig.savefig(os.path.join(folder, "density_of_states.png"))
    plt.close(fig)


_BC_COLORS = {1: "tab:red", 2: "tab:green", 3: "tab:blue", 4: "tab:orange"}
_BC_NAMES = {1: "T", 2: "P", 3: "R", 4: "F"}


def plot_geometry(domain, folder: str):
    """Boundary-condition facet plot + subvolume connection graph
    (reference classes/Geometry.py:768-791, 1054-1068)."""
    mesh = domain.mesh
    fig = plt.figure(figsize=(8, 6), dpi=120)
    ax = fig.add_subplot(projection="3d")
    for fct in range(mesh.n_facets):
        col = _BC_COLORS.get(int(domain.bound_cond[fct]), "gray")
        tris = mesh.tri[mesh.facets[fct]]
        for t in tris:
            loop = np.vstack([t, t[:1]])
            ax.plot(loop[:, 0], loop[:, 1], loop[:, 2], color=col, lw=0.7)
        c = mesh.facet_centroids[fct]
        ax.text(c[0], c[1], c[2],
                f"{fct}:{_BC_NAMES.get(int(domain.bound_cond[fct]), '?')}",
                fontsize=7)
    ax.set_box_aspect(np.ptp(mesh.bounds, axis=0) + 1e-9)
    fig.tight_layout()
    fig.savefig(os.path.join(folder, "BC_plot.png"))
    plt.close(fig)

    fig = plt.figure(figsize=(8, 6), dpi=120)
    ax = fig.add_subplot(projection="3d")
    c = domain.subvol_center
    ax.scatter(c[:, 0], c[:, 1], c[:, 2], s=12, c="k")
    for a, b in domain.subvol_connections:
        ax.plot(c[[a, b], 0], c[[a, b], 1], c[[a, b], 2], "b-", lw=0.8)
    ax.set_box_aspect(np.ptp(mesh.bounds, axis=0) + 1e-9)
    fig.tight_layout()
    fig.savefig(os.path.join(folder, "subvol_connections.png"))
    plt.close(fig)


def read_convergence(path: str, n_sv: int, n_res: int, subvol_type: str, n_con: int):
    """Parse convergence.txt back into arrays (Visualisation.py:122-157)."""
    rows = []
    with open(path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            rows.append(line.split())
    data = np.array(rows)
    out = dict(
        datetime=data[:, 0],
        timestep=data[:, 1].astype(int),
        sim_time=data[:, 2].astype(float),
        total_en=data[:, 3].astype(float),
        en_res=data[:, 4 : 4 + n_res].astype(float),
        phi_res=data[:, 4 + n_res : 4 + 4 * n_res].astype(float),
        N_p=data[:, 4 + 4 * n_res].astype(int),
        T=data[:, 5 + 4 * n_res : 5 + 4 * n_res + n_sv].astype(float),
        sv_en=data[:, 5 + 4 * n_res + n_sv : 5 + 4 * n_res + 2 * n_sv].astype(float),
        sv_phi=data[:, 5 + 4 * n_res + 2 * n_sv : 5 + 4 * n_res + 5 * n_sv].astype(float),
        sv_Np=data[:, 5 + 4 * n_res + 5 * n_sv : 5 + 4 * n_res + 6 * n_sv].astype(float),
    )
    base = 5 + 4 * n_res + 6 * n_sv
    if subvol_type == "slice":
        out["sv_k"] = data[:, base : base + n_sv].astype(float)
        out["k"] = data[:, base + n_sv].astype(float)
    else:
        out["con_k"] = data[:, base : base + n_con].astype(float)
    return out


def plot_convergence(folder: str, conv: dict, subvol_type: str, theme: str = "white"):
    t = conv["sim_time"]

    def save(fig, name):
        fig.tight_layout()
        fig.savefig(os.path.join(folder, name))
        plt.close(fig)

    n_sv = conv["T"].shape[1]
    cmap = plt.get_cmap("jet")
    colors = cmap(np.linspace(0, 1, n_sv))

    fig, ax = plt.subplots(figsize=(8, 5), dpi=120)
    for i in range(n_sv):
        ax.plot(t, conv["T"][:, i], color=colors[i], lw=1, label=f"Sv {i}")
    ax.set_xlabel("Simulated time [ps]")
    ax.set_ylabel("Temperature [K]")
    ax.legend(fontsize="x-small", ncol=2)
    save(fig, "convergence_T.png")

    fig, ax = plt.subplots(figsize=(8, 5), dpi=120)
    for i in range(n_sv):
        ax.plot(t, conv["sv_phi"][:, 3 * i], color=colors[i], lw=1, label=f"Sv {i}")
    ax.set_xlabel("Simulated time [ps]")
    ax.set_ylabel("Heat flux x [W/m$^2$]")
    ax.legend(fontsize="x-small", ncol=2)
    save(fig, "convergence_phi.png")

    fig, ax = plt.subplots(figsize=(8, 5), dpi=120)
    ax.plot(t, conv["N_p"], "k-", lw=1)
    ax.set_xlabel("Simulated time [ps]")
    ax.set_ylabel("Number of particles")
    save(fig, "convergence_Np.png")

    fig, ax = plt.subplots(figsize=(8, 5), dpi=120)
    for i in range(n_sv):
        ax.plot(t, conv["sv_en"][:, i], color=colors[i], lw=1, label=f"Sv {i}")
    ax.set_xlabel("Simulated time [ps]")
    ax.set_ylabel("Energy density [eV/$\\AA^3$]")
    ax.legend(fontsize="x-small", ncol=2)
    save(fig, "convergence_e.png")

    fig, ax = plt.subplots(figsize=(8, 5), dpi=120)
    if subvol_type == "slice":
        for i in range(n_sv):
            ax.plot(t, conv["sv_k"][:, i], color=colors[i], lw=0.8, label=f"Sv {i}")
        ax.plot(t, conv["k"], "k-", lw=2, label="total")
        n_mean = min(len(t), 10)
        kmean = conv["k"][-n_mean:].mean()
        kstd = conv["k"][-n_mean:].std()
        ax.axhline(kmean, color="gray", ls="--", lw=1)
        ax.set_title(f"$\\kappa$ = {kmean:.2f} $\\pm$ {kstd:.2f} W/m·K (last {n_mean} pts)")
    else:
        for i in range(conv["con_k"].shape[1]):
            ax.plot(t, conv["con_k"][:, i], lw=0.8, label=f"Con {i}")
    ax.set_xlabel("Simulated time [ps]")
    ax.set_ylabel("$\\kappa$ [W/m·K]")
    ax.legend(fontsize="x-small", ncol=2)
    save(fig, "convergence_kappa.png")


def plot_energy_balance(folder: str, conv: dict):
    fig, ax = plt.subplots(figsize=(8, 5), dpi=120)
    t = conv["sim_time"]
    for i in range(conv["en_res"].shape[1]):
        ax.plot(t, conv["en_res"][:, i], lw=1, label=f"Res {i}")
    ax.plot(t, conv["en_res"].sum(axis=1), "k--", lw=1, label="total")
    ax.axhline(0, color="gray", lw=0.5)
    ax.set_xlabel("Simulated time [ps]")
    ax.set_ylabel("Energy balance [eV/ps]")
    ax.legend(fontsize="small")
    fig.tight_layout()
    fig.savefig(os.path.join(folder, "convergence_en_balance.png"))
    plt.close(fig)


def plot_particles(folder: str, positions: np.ndarray, colors: np.ndarray,
                   label: str, name: str, colormap: str = "jet"):
    fig = plt.figure(figsize=(8, 6), dpi=120)
    ax = fig.add_subplot(projection="3d")
    n = len(positions)
    sel = np.random.default_rng(0).choice(n, size=min(n, 20000), replace=False)
    sc = ax.scatter(
        positions[sel, 0], positions[sel, 1], positions[sel, 2],
        c=colors[sel], s=1, cmap=colormap,
    )
    fig.colorbar(sc, label=label, shrink=0.6)
    ax.set_box_aspect(np.ptp(positions, axis=0) + 1e-9)
    fig.tight_layout()
    fig.savefig(os.path.join(folder, name))
    plt.close(fig)


def spectral_kappa(sim, n_bands: int = 100, T_mean: np.ndarray | None = None):
    """Per-connection spectral kappa contribution (reference
    flux_contribution, Visualisation.py:593-666), for ANY subvolume type.

    For each connection c=(i,j): particles in subvolume i or j contribute
        k_p = -(phi_p . dX_c) / dT_c * n_active_modes / N_c,
    with phi_p = density-normalised hbar*omega*dn*v in W/m^2 and dX_c the
    centre-to-centre vector in meters; contributions are histogrammed over
    `n_bands` frequency bands. Returns (centers (B,), k (C,B), connections
    (C,2)). The per-band rows of k sum to the connection's particle-estimated
    total kappa. `T_mean` overrides the instantaneous subvolume temperatures
    with rolling means (the reference uses its convergence-window means)."""
    s = sim.state
    alive = np.asarray(s.alive)
    modes = np.asarray(s.mode)[alive]
    mat = sim.material
    omega = mat.omega.reshape(-1)[modes]
    vel = mat.group_vel.reshape(-1, 3)[modes]
    occ = sim.occupation_of(s)[alive]
    T_sv = np.asarray(s.T_sv, dtype=float)
    sv = np.asarray(s.sv_id)[alive]
    from nanokappa_tpu.constants import A_IN_M, EVPSA2_IN_WM2
    from nanokappa_tpu.material.tables import bose_einstein

    dn = occ - bose_einstein(T_sv[sv], omega)
    # phi per particle, W/m^2 after density normalisation (reference
    # normalise_to_density, classes/Phonon.py:392-401)
    dens = 1.0 / (mat.n_qpoints * mat.volume_unitcell)
    phi_p = (HBAR * omega * dn)[:, None] * vel * dens * EVPSA2_IN_WM2  # (N,3)

    dom = sim.domain
    cons = np.atleast_2d(np.asarray(dom.subvol_connections, dtype=int))
    centers_sv = dom.subvol_center
    Tm = T_sv if T_mean is None else np.asarray(T_mean, dtype=float)

    bands = np.linspace(0, mat.omega.max() * 1.000001, n_bands + 1)
    centers = (bands[:-1] + bands[1:]) / 2
    idx = np.digitize(omega, bands) - 1
    k = np.full((len(cons), n_bands), np.nan)
    for c, (i, j) in enumerate(cons):
        sel = (sv == i) | (sv == j)
        n_c = int(sel.sum())
        dT = Tm[j] - Tm[i]
        if n_c == 0 or dT == 0:
            continue
        dX = (centers_sv[j] - centers_sv[i]) * A_IN_M
        k_p = -(phi_p[sel] @ dX) / dT * (mat.n_active_modes / n_c)
        band = np.zeros(n_bands)
        np.add.at(band, idx[sel], k_p)
        k[c] = band
    return centers, k, cons


def runtime_figures(sim):
    """Particle scatter figures refreshed during the run (reference
    plot_figures every 100 steps, classes/Population.py:1729-1735)."""
    s = sim.state
    cmap = str(sim.args.colormap[0])
    alive = np.asarray(s.alive)
    pos = np.asarray(s.pos)[alive]
    for prop in list(sim.args.fig_plot)[:1]:  # first property only, per cycle
        if prop in ("e", "energy"):
            omega = sim.material.omega.reshape(-1)[np.asarray(s.mode)[alive]]
            colors = HBAR * omega * np.asarray(s.dev)[alive]
            plot_particles(sim.folder, pos, colors, "energy deviation [eV]", "fig_energy.png", cmap)
        elif prop in ("T", "temperature", "temperatures"):
            T_sv = np.asarray(s.T_sv, dtype=float)
            colors = T_sv[np.asarray(s.sv_id)[alive]]
            plot_particles(sim.folder, pos, colors, "Temperature [K]", "fig_temperature.png", cmap)


def plot_kappa_path(sim, folder: str):
    """3-D connection graph coloured by kappa, with the snapped path
    highlighted (reference plot_kappa_path, classes/Visualisation.py:719-765)."""
    dom = sim.domain
    W = list(sim.window)
    if not W or "kappa_con" not in W[0]:
        return
    k = np.nanmean(np.stack([w["kappa_con"] for w in W]), axis=0)
    c = dom.subvol_center
    fig = plt.figure(figsize=(8, 6), dpi=120)
    ax = fig.add_subplot(projection="3d")
    km = np.nanmax(np.abs(k)) or 1.0
    cmap = plt.get_cmap("jet")
    for ci, (a, b) in enumerate(dom.subvol_connections):
        ax.plot(
            c[[a, b], 0], c[[a, b], 1], c[[a, b], 2],
            color=cmap(0.5 + 0.5 * np.nan_to_num(k[ci]) / km), lw=1.2,
        )
    if sim.kappa_path is not None:
        p = np.asarray(sim.kappa_path)
        ax.plot(c[p, 0], c[p, 1], c[p, 2], "k-", lw=2.5)
    ax.scatter(c[:, 0], c[:, 1], c[:, 2], s=10, c="k")
    fig.tight_layout()
    fig.savefig(os.path.join(folder, "kappa_con.png"))
    plt.close(fig)


def postprocess(sim, verbose: bool = False):
    set_theme(str(sim.args.theme[0]))
    folder = sim.folder
    dom = sim.domain
    conv = read_convergence(
        os.path.join(folder, "convergence.txt"),
        dom.n_of_subvols, dom.n_of_reservoirs, dom.subvol_type,
        len(dom.subvol_connections),
    )
    plot_convergence(folder, conv, dom.subvol_type)
    if dom.n_of_reservoirs:
        plot_energy_balance(folder, conv)

    # particle scatters
    s = sim.state
    alive = np.asarray(s.alive)
    pos = np.asarray(s.pos)[alive]
    fig_props = list(sim.args.fig_plot) or ["energy"]
    mat = sim.material
    omega = mat.omega.reshape(-1)[np.asarray(s.mode)[alive]]
    for prop in fig_props:
        if prop in ("T", "temperature", "temperatures"):
            T_sv = np.asarray(s.T_sv, dtype=float)
            colors = T_sv[np.asarray(s.sv_id)[alive]]
            plot_particles(folder, pos, colors, "Temperature [K]", "fig_temperature.png")
        elif prop in ("omega", "angular_frequency", "frequency"):
            plot_particles(folder, pos, omega, "$\\omega$ [rad THz]", "fig_omega.png")
        elif prop in ("n", "occupation"):
            colors = np.asarray(s.dev)[alive]
            plot_particles(folder, pos, colors, "occupation deviation", "fig_occupation.png")
        elif prop in ("e", "energy"):
            colors = HBAR * omega * np.asarray(s.dev)[alive]
            plot_particles(folder, pos, colors, "energy deviation [eV]", "fig_energy.png")
        elif prop in ("sv", "subvolumes", "subvolume"):
            colors = np.asarray(s.sv_id)[alive].astype(float)
            plot_particles(folder, pos, colors, "subvolume", "fig_subvol.png")

    if dom.subvol_type != "slice":
        plot_kappa_path(sim, folder)

    # spectral kappa per connection (reference k_contribution.png,
    # Visualisation.py:593-666; histogram + cumulative panel per connection)
    if len(np.atleast_2d(dom.subvol_connections)) and (
        dom.n_of_reservoirs >= 2 or dom.subvol_type != "slice"
    ):
        centers, k_band, cons = spectral_kappa(sim)
        fig, ax = plt.subplots(nrows=2, figsize=(9, 10), dpi=120, sharex="all")
        for c, (i, j) in enumerate(cons):
            if np.all(np.isnan(k_band[c])):
                continue
            ax[0].step(centers, k_band[c], where="mid", label=f"Con. {i}-{j}")
            ax[1].plot(centers, np.nancumsum(k_band[c]), label=f"Con. {i}-{j}")
        if len(cons) < 25:
            ax[0].legend(fontsize="small")
        ax[0].set_ylabel("$\\kappa(\\omega)$ in band [W/m·K]")
        ax[1].set_ylabel("cumulated $\\kappa(\\omega)$ [W/m·K]")
        ax[1].set_xlabel("$\\omega$ [rad THz]")
        fig.tight_layout()
        fig.savefig(os.path.join(folder, "k_contribution.png"))
        plt.close(fig)
