#!/usr/bin/env bash
# Generate reference-binary golden outputs for the <1e-6 fidelity tests
# (tests/test_reference_golden.py).
#
# Uses the serially-built reference binary (see build_reference.sh) on
# short-horizon variants of the reference's own test configs
# (test/spreading_ring/setup.yml, test/planet_torque/torque_test.yml): same
# physics, but snapshots land after a few hundred steps so f64 trajectories
# are comparable at <1e-6 before chaotic/roundoff growth dominates.
# OMP_NUM_THREADS=1 keeps any OpenMP sum reductions bit-deterministic.
#
# Usage: tools/refgolden/gen_goldens.sh
# Writes tests/goldens/<name>/snapshots/... into the repo.
set -euo pipefail

HERE="$(cd "$(dirname "$0")" && pwd)"
REPO="$(cd "$HERE/../.." && pwd)"
REF=/root/reference
BIN=/tmp/refbuild/bin/fargocpt_exe
RUNROOT=/tmp/refrun

[ -x "$BIN" ] || bash "$HERE/build_reference.sh"

run_golden() {
    local name="$1" src_cfg="$2"
    local dir="$RUNROOT/golden_$name"
    rm -rf "$dir"
    mkdir -p "$dir"
    cp "$src_cfg" "$dir/setup.yml"
    # short horizon + absolute output dir
    python3 - "$dir/setup.yml" "$dir/out" <<'EOF'
import re, sys
path, outdir = sys.argv[1], sys.argv[2]
text = open(path).read()
def setkey(text, key, val):
    pat = re.compile(rf"^{key}:.*$", re.M)
    assert pat.search(text), key
    return pat.sub(f"{key}: '{val}'", text)
text = setkey(text, "OutputDir", outdir)
text = setkey(text, "Nsnapshots", "2")
text = setkey(text, "Nmonitor", "1")
if "spreading_ring" in outdir:
    text = setkey(text, "MonitorTimestep", "2.0")
elif "temperature" in outdir:
    text = setkey(text, "MonitorTimestep", "4.0")
elif "shocktube" in outdir:
    text = setkey(text, "MonitorTimestep", "0.1")
elif "binary_gcfull" in outdir:
    text = setkey(text, "MonitorTimestep", "0.0002")
elif "binary_gceph_long" in outdir:
    text = setkey(text, "MonitorTimestep", "1.5707963267948966")
elif "binary_gceph" in outdir:
    text = setkey(text, "MonitorTimestep", "0.015707963267948967")
else:
    text = setkey(text, "MonitorTimestep", "0.6283185307179586")
open(path, "w").write(text)
EOF
    (cd "$dir" && OMP_NUM_THREADS=1 "$BIN" start setup.yml >run.log 2>&1)
    local dst="$REPO/tests/goldens/$name"
    rm -rf "$dst"
    mkdir -p "$dst"
    cp -r "$dir/out/snapshots" "$dst/"
    cp "$dir/out/used_rad.dat" "$dir/out/dimensions.dat" "$dst/"
    cp "$dir/setup.yml" "$dst/"
    # the rebound archives are binary REBOUND internals we never read back;
    # 1D profiles are azimuthal averages of the 2D fields (derivable); energy
    # is unused in these isothermal setups
    find "$dst" -name 'rebound.bin' -delete
    find "$dst" -name '*1D.dat' -delete
    # energy matters only for the adiabatic golden
    case "$name" in temperature_test|temperature_fld|shocktube_sn|shocktube_pvte|cold_disk_planet|longrun_planet|binary_gceph|binary_gceph_long|binary_gcfull) : ;; *)
        find "$dst" -name 'energy.dat' -delete ;;
    esac
    echo "golden '$name' written to $dst"
    grep "Total Hydrosteps" "$dir/run.log" || true
}

run_golden spreading_ring "$REF/test/spreading_ring/setup.yml"
run_golden planet_torque "$REF/test/planet_torque/torque_test.yml"
# adiabatic energy-equation golden: viscous heating + simple-opacity
# surface cooling + LeapFrog (test/TemperatureTest)
run_golden temperature_test "$REF/test/TemperatureTest/angelo.yml"
# FLD golden: same setup with implicit radiative diffusion enabled (our
# red-black SOR vs the reference's lexicographic SOR — both converge the
# same linear system to 1e-10 per step)
run_golden temperature_fld "$HERE/configs/temperature_fld.yml"
# accreting planet in a corotating frame (Kley two-zone accretion,
# disk feedback, LeapFrog): pins accretion bookkeeping + corotation
run_golden planet_accretion "$HERE/configs/planet_accretion.yml"
# Sod shock tube (ShockTube=1, Euler + SN artvisc): pins the energy
# equation + artificial-viscosity dissipation without any disk physics
run_golden shocktube_sn "$REF/test/shockTube/setups/shocktube_SN.yml"
# PVTE variable-gamma shock tube: quantifies the in-graph bisection EoS
# vs the reference's GSL 2-D lookup tables
run_golden shocktube_pvte "$REF/test/shockTube_PVTE/shocktube_varGamm.yml"
# planet in a cold adiabatic disk: beta cooling toward the reference
# profile + Bell opacity + TW artvisc factor 3 + HeatingCoolingCFLlimit
# (test/cold_disk_planet) — pins the planet/energy-equation coupling
run_golden cold_disk_planet "$REF/test/cold_disk_planet/setup.yml"
# gamma-Cephei-like close binary (setups/CloseBinaries/
# gamma_cephei_primary.yml shrunk to 128x256 on r in [0.1, 0.6]): e=0.4
# q=0.29 secondary from periapsis, cubic-smoothed binary potential + nbody
# indirect term + thermal cooling + damping — the only golden with TWO
# massive bodies.  Snapshots at t = pi/2 and pi (half a binary orbit).
run_golden binary_gceph "$HERE/configs/binary_gceph.yml"
# the same binary over half an orbit (chaos-floor tracking gate, see
# tests/test_reference_golden.py binary_gceph_long@snap1)
run_golden binary_gceph_long "$HERE/configs/binary_gceph.yml"
# FULL gamma-Cephei configuration: secondary inside the grid, Nbody ICs,
# viscous accretion, irradiation, AspectRatioMode 1, AlphaMode 2,
# CenterOfMass outer BC (see tests/test_reference_golden.py)
run_golden binary_gcfull "$HERE/configs/binary_gcfull.yml"
