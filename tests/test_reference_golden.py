"""Reference-binary golden fidelity gates.

The goldens in tests/goldens/ are produced by the REAL reference binary
(built from /root/reference/src by tools/refgolden/build_reference.sh, a
serial-MPI strict-IEEE -O2 build) running short-horizon variants of the
reference's own test setups (test/spreading_ring/setup.yml,
test/planet_torque/torque_test.yml); see tools/refgolden/gen_goldens.sh.

These tests run this framework f64 on the *identical* YAML setup and
require the 2-D fields to match the reference binary snapshot-for-snapshot:

  * spreading_ring: 660 steps to t=4.0 (viscous ring, Euler integrator,
    outflow BCs) — observed agreement ~6e-12, gated at 1e-9.
  * planet_torque: 76 steps to t=1.257 (LeapFrog, embedded 2e-5 Msun
    planet with ramp-up, TW artificial viscosity, reflecting+balanced
    BCs, vrad damping, cps grid sizing, REBOUND-predictor indirect term)
    — observed agreement ~2e-7 on vrad (f64 roundoff seeded by FMA
    contraction differences, amplified in the planet wake), gated at 1e-6
    per BASELINE.json.

Any substep-ordering or physics regression shows up here as orders of
magnitude, not factors.
"""

from pathlib import Path

import numpy as np
import pytest

from fargocpt_tpu.config import Config
from fargocpt_tpu.sim import Simulation
from fargocpt_tpu import output as out

GOLDENS = Path(__file__).parent / "goldens"


@pytest.mark.slow
@pytest.mark.parametrize("name,tol", [
    ("spreading_ring", 1e-9),
    ("planet_torque", 1e-6),
    # adiabatic energy equation: viscous heating (constant nu) +
    # simple-opacity surface cooling + LeapFrog, 240 steps to t=8
    ("temperature_test", 1e-6),
    # + implicit FLD radiative diffusion: red-black vs lexicographic SOR
    # converge the same linear system to the reference's effective
    # tolerance reltol*MinimumTemperature (src/fld.cpp:235-237) —
    # observed agreement ~9e-10
    ("temperature_fld", 1e-6),
    # accreting planet (Kley two-zone) + corotating frame + disk
    # feedback, LeapFrog — observed agreement 1.6e-9 (Sigma) / 1.6e-7
    # (vrad) after 76 steps.  The former 1e-2 residual was the
    # stale-pressure semantics: the reference recomputes pressure only at
    # step END (recalculate_derived_disk_quantities,
    # src/simulation.cpp:456), so kick 1's pressure-gradient source term
    # must see the PRE-accretion pressure (step.py stale_derived)
    ("planet_accretion", 1e-6),
    # planet in a cold adiabatic disk (test/cold_disk_planet): beta
    # cooling toward the reference profile + Bell opacity + TW artvisc
    # factor 3 + HeatingCoolingCFLlimit, Euler, 28 steps to t=1.257
    ("cold_disk_planet", 1e-6),
    # LONG-RUN campaign golden: the same physics over 20 planet orbits
    # (2800 steps to t=125.66, snapshots at 10 and 20 orbits) — a 100x
    # longer horizon than the other goldens; observed agreement 8.5e-8
    # (Sigma) / 2.5e-6 (vrad) at 10 orbits and 5e-9 / 3.7e-8 at 20,
    # gated at 1e-5 to absorb roundoff-seeded wake growth
    ("longrun_planet", 1e-5),
    # Sod shock tube (ShockTube=1): energy equation + SN artvisc
    # dissipation in isolation, 255 steps to t=0.2
    ("shocktube_sn", 1e-6),
    # PVTE variable-gamma shock tube (3283 steps, identical count): the
    # in-graph bisection EoS vs the reference's bilinear (rho, e) lookup
    # tables — the table-interpolation difference leaves 1.5e-3 (Sigma) /
    # 5.3e-3 (vrad, at the shock front) after 3283 steps (was 2.4e-1
    # before the shock-tube rho convention fix); gated just above that
    # floor (the lookup-mode run below pins the table-quantized
    # semantics at 2e-4, so the residual here is the table error itself)
    ("shocktube_pvte", 6e-3),
    # same shock tube with PVTELookupTable=yes: the reference-exact
    # 1000x1000 (rho, e) table quantization (src/pvte_law.cpp:370-440,
    # incl. the table-build Brent's |b-a|<1e-3-Kelvin termination)
    # removes the table-vs-bisection difference: observed MEDIAN 7e-16
    # (f64 roundoff), p99 3.4e-6; the max (1.1e-4 on vrad) sits in the
    # 2-3 cells AT the moving shock front — phase roundoff amplified
    # over 3283 steps, not an EoS difference
    ("shocktube_pvte@lookup", 2e-4),
    # gamma-Cephei-like BINARY (setups/CloseBinaries/
    # gamma_cephei_primary.yml, shrunk grid): e=0.4 q=0.29 secondary AT
    # periapsis (= the outer grid edge) — cubic-smoothed binary
    # potential + nbody indirect term + thermal cooling + viscous
    # outflow/reflecting BCs + mean/zero damping — the only golden with
    # TWO massive bodies.  92 steps to t=pi/100 through the MAXIMUM of
    # the tidal forcing; observed agreement ~1e-8.  This gate found the
    # kick-2 stale-scale-height ordering (reference simulation.cpp:363
    # computes the potential before any cs/H refresh)
    ("binary_gceph", 1e-5),
    # the FULL gamma-Cephei configuration (setups/CloseBinaries/
    # gamma_cephei_full.yml shrunk to 128x256, r in [0.05, 12]): the
    # e=0.4 secondary orbits INSIDE the grid with cubic smoothing and
    # VISCOUS accretion, Nbody-centered (CMS) Sigma/energy/velocity ICs
    # with inner profile cutoff + circumbinary Gaussian ring,
    # AspectRatioMode 1 (nbody H), AlphaMode 2 (star-distance alpha
    # ramp), TW artvisc, stellar irradiation from BOTH stars, thermal
    # cooling, viscous-inner + CenterOfMass-outer BCs.  72 steps through
    # the cold-start transient; observed agreement ~1e-7 (the cutoff
    # wall amplifies roundoff x1.5/step, so longer horizons are chaos-
    # dominated).  This gate drove: Nbody-centered ICs (Rinf sampling,
    # CMS cutoffs, CMS-frame velocities), the all-body COM for the outer
    # COM BC + its grid-corrected drift table, the kick-scoped staleness
    # of H and nu (potential smoothing, BC viscosity, accretion nu), the
    # AspectRatioMode-1 ASPECTRATIO grid in irradiation, and the
    # reference's InnerBoundaryEnergy-falls-back-to-OUTER-name quirk
    ("binary_gcfull", 1e-5),
    # the same binary over HALF AN ORBIT (3263 steps to t=pi/2): the
    # initial periapsis transient is chaotically unstable — the
    # reference against itself (only the monitor cadence changed)
    # already deviates by 1.4e-3 (Sigma) / 1.9e-3 (vrad) at t=pi/2, and
    # f64 roundoff amplifies ~x1.3/step through the transient — so this
    # is a CHAOS-FLOOR tracking gate, not a trajectory gate: our
    # observed deviation is 8.8e-4/2.7e-3, the same magnitude as the
    # reference's own cadence sensitivity, while the pre-fix stale-H bug
    # sat at 1.7e-2 (caught).  Snapshot 1 only; step counts agree to 3%
    ("binary_gceph_long@snap1", 5e-3),
])
def test_fields_match_reference_binary(name, tol, tmp_path):
    name, _, variant = name.partition("@")
    golden = GOLDENS / name
    cfg = Config.from_file(str(golden / "setup.yml"))
    if variant == "lookup":
        lk = "PVTELookupTable"
        cfg._raw[lk.lower()] = "Yes"
        cfg._orig_case[lk.lower()] = lk
    snaps, exact_steps = ("1", "2"), True
    if variant == "snap1":
        # chaos-floor gate: stop at the first snapshot, compare it only,
        # and require step counts to agree approximately (the dt
        # trajectory through a chaotic transient is roundoff-sensitive)
        cfg._raw["nsnapshots"] = "1"
        snaps, exact_steps = ("1",), False
    sim = Simulation(cfg, outdir=str(tmp_path / "out"), dtype="float64")
    out.OutputWriter(sim)
    sim.run()

    nr, na = sim.geometry.nrad, sim.geometry.naz
    # grid must be identical before fields can be compared (also pins the
    # cps-based sizing for planet_torque, reference src/Interpret.cpp:206)
    ref_rad = np.loadtxt(golden / "used_rad.dat")
    assert ref_rad.shape[0] == nr + 1
    np.testing.assert_allclose(sim.geometry.radii[:nr + 1], ref_rad,
                               rtol=1e-12)

    fields = [("Sigma", nr), ("vrad", nr + 1), ("vazi", nr)]
    if (golden / "snapshots" / "1" / "energy.dat").exists():
        fields.append(("energy", nr))
    for snap in snaps:
        for field, rows in fields:
            g = np.fromfile(golden / "snapshots" / snap / f"{field}.dat")
            m = np.fromfile(tmp_path / "out" / "snapshots" / snap /
                            f"{field}.dat")
            assert g.shape == m.shape == (rows * na,)
            scale = np.max(np.abs(g))
            err = np.max(np.abs(g - m)) / scale
            assert err < tol, (f"{name} snapshot {snap} {field}: "
                               f"max rel dev {err:.3e} >= {tol}")

    # step counts and dt trajectory must agree exactly (misc.bin:
    # [u32 snapshot, u32 monitor, f64 time, f64 omega_frame,
    #  f64 frame_angle, f64 last_dt, u32 n_iter])
    for snap in snaps:
        bg = (golden / "snapshots" / snap / "misc.bin").read_bytes()
        bm = (tmp_path / "out" / "snapshots" / snap /
              "misc.bin").read_bytes()
        ng = int(np.frombuffer(bg[40:44], np.uint32)[0])
        nm = int(np.frombuffer(bm[40:44], np.uint32)[0])
        if exact_steps:
            assert ng == nm, f"hydro step count differs: ref {ng} vs {nm}"
            dt_g = float(np.frombuffer(bg[32:40], np.float64)[0])
            dt_m = float(np.frombuffer(bm[32:40], np.float64)[0])
            assert abs(dt_g - dt_m) / dt_g < max(1e-6, tol)
        else:
            assert abs(ng - nm) / ng < 0.05, \
                f"hydro step count off by >5%: ref {ng} vs {nm}"
