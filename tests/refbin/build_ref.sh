#!/bin/sh
# Compile the UNMODIFIED reference sources (/root/reference) against the
# clean-room Armadillo shim header, producing the parity-test binary.
# Output: /root/repo/tests/refbin/build/gp_ss_ak
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
REF="${REF_DIR:-/root/reference}"
OUT="$HERE/build"
mkdir -p "$OUT"
# -O0 deliberately: six reference functions fall off the end of a
# value-returning function (MahaDist/EuclDist Kernel.cpp:1368,1435;
# solve_chol GP_Utils.cpp:845; mvmK_exact GP_Utils.cpp:1125; setNPars
# Kernel.h:112; ChkBnd Opt_pars.h:98) — undefined behavior that GCC
# miscompiles at -O1 and above (verified: ASan-clean at -O0, wild pointers
# at -O1/-O2). The shipped reference build is also unoptimized
# (make_linux:19 uses -ggdb; the -O3 line is commented out), so -O0 IS the
# as-shipped configuration. BLAS/LAPACK still run optimized.
g++ -std=c++11 -O0 -w -I"$HERE/include" \
    "$REF/gp_ss_ak.cpp" "$REF/GP_Utils.cpp" "$REF/Kernel.cpp" \
    "$REF/Control.cpp" "$REF/Opt_pars.cpp" \
    -o "$OUT/gp_ss_ak" \
    -l:liblapack.so.3 -l:libblas.so.3
echo "built $OUT/gp_ss_ak"
