#!/usr/bin/env bash
# Build the reference FargoCPT binary (/root/reference/src) without an MPI /
# FFTW / GSL installation, using the serial MPI stub in mpi_stub/.
#
# The reference tree is read-only, so the source is copied to a scratch
# build dir first. FFTW and GSL are compiled out via the reference's own
# -DDISABLE_FFTW / -DDISABLE_GSL switches (src/makefile.defs:48-50); empty
# archives satisfy the hardcoded -lfftw3*/-lgsl* link lines. Optimization is
# lowered from -Ofast to -O2 so the goldens are strict-IEEE f64 (no
# fast-math reassociation noise in the <1e-6 fidelity comparisons).
#
# Usage: tools/refgolden/build_reference.sh [BUILDROOT]
# Produces $BUILDROOT/bin/fargocpt_exe (default /tmp/refbuild).
set -euo pipefail

HERE="$(cd "$(dirname "$0")" && pwd)"
REF=/root/reference
BUILDROOT="${1:-/tmp/refbuild}"
STUB="$BUILDROOT/mpi_prefix"

mkdir -p "$BUILDROOT" "$STUB/include" "$STUB/lib"

# 1. serial MPI stub -> libmpi.a
cp "$HERE/mpi_stub/include/mpi.h" "$STUB/include/"
gcc -O2 -Wall -c "$HERE/mpi_stub/src/mpi_stub.c" -I"$STUB/include" \
    -o "$STUB/lib/mpi_stub.o"
ar cr "$STUB/lib/libmpi.a" "$STUB/lib/mpi_stub.o"

# 2. empty archives for the disabled libs' link lines
for lib in fftw3 fftw3_mpi fftw3_omp gsl gslcblas; do
    ar cr "$STUB/lib/lib$lib.a"
done

# 3. copy the reference source (once; reuse on rebuild)
if [ ! -d "$BUILDROOT/src" ]; then
    cp -r "$REF/src" "$BUILDROOT/src"
fi

# 4. strict IEEE instead of -Ofast (see header comment)
sed -i 's/^OPTIMIZATION := -Ofast/OPTIMIZATION := -O2/' \
    "$BUILDROOT/src/makefile.defs"

# 4b. the reference's own DISABLE_FFTW path in stress.cpp forgets to include
# LowTasks.h (PersonalExit) — fix the build copy
grep -q 'LowTasks.h' "$BUILDROOT/src/stress.cpp" ||
    sed -i 's/#include "stress.h"/#include "stress.h"\n#include "LowTasks.h"/' \
	"$BUILDROOT/src/stress.cpp"

# 4c. spreading-ring IC needs a modified-Bessel function; patch in the local
# implementation so it works under -DDISABLE_GSL
python3 "$HERE/patch_reference.py" "$BUILDROOT/src"

# 5. build
cd "$BUILDROOT/src"
make -j"$(nproc)" \
    FARGOCPT_CC=gcc FARGOCPT_CXX=g++ \
    MPI_HOME="$STUB" FFTW_HOME="$STUB" GSL_HOME="$STUB" \
    CLI_OPTIONS="-DDISABLE_GSL -DDISABLE_FFTW"

echo "reference binary: $BUILDROOT/bin/fargocpt_exe"
