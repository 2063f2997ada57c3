#!/usr/bin/env python3
"""Patch the *copied* reference source tree (never /root/reference itself)
so the spreading-ring initial condition works under -DDISABLE_GSL, using the
local bessel_stub.cpp instead of GSL's gsl_sf_bessel_Inu.

Usage: patch_reference.py <builddir-src>
"""
import shutil
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent

STUB_BLOCK = """#ifdef DISABLE_GSL
void init_spreading_ring_test([[maybe_unused]] t_data &data) {
\tlogging::print_master(LOG_ERROR "GSL is not compiled in. Cannot initialize spreading ring test.\\n");
\tPersonalExit(1);
}
#else // DISABLE_GSL
"""

REPLACEMENT = (
    "double gsl_sf_bessel_Inu(double nu, double z); "
    "/* local bessel_stub.cpp (serial golden build) */\n"
)


def main() -> None:
    src = Path(sys.argv[1])
    init_cpp = src / "init.cpp"
    text = init_cpp.read_text()

    if "bessel_stub" in text:
        print("init.cpp already patched")
    else:
        idx = text.find(STUB_BLOCK)
        if idx < 0:
            sys.exit("patch_reference.py: spreading-ring stub block not found")
        text = text[:idx] + REPLACEMENT + text[idx + len(STUB_BLOCK):]
        # drop the matching #endif right after the real function
        endif = "#endif // DISABLE_GSL"
        jdx = text.find(endif, idx)
        if jdx < 0:
            sys.exit("patch_reference.py: trailing #endif not found")
        text = text[:jdx] + text[jdx + len(endif):]
        init_cpp.write_text(text)
        print("patched init.cpp (spreading-ring Bessel via bessel_stub.cpp)")

    shutil.copy(HERE / "bessel_stub.cpp", src / "bessel_stub.cpp")
    print("installed bessel_stub.cpp")


if __name__ == "__main__":
    main()
