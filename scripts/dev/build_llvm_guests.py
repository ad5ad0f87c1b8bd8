"""Build the committed LLVM-guest ELF fixtures from the IR sources in
zkvm/guests_llvm.py using the system libLLVM-15 RISC-V backend.

Provenance: run in-image (`python scripts/dev/build_llvm_guests.py`);
byte-stable for the pinned LLVM 15.0.6 distribution library."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

from eigen_zkvm_tpu.zkvm import guests_llvm as gl, llvm_backend as lb


def main():
    os.makedirs(gl.DATA_DIR, exist_ok=True)
    for name, (ir, exp) in gl.GUESTS.items():
        elf = lb.ir_to_elf(ir)
        with open(gl.fixture_path(name), "wb") as f:
            f.write(elf)
        print(name, len(elf), "bytes ->", gl.fixture_path(name))


if __name__ == "__main__":
    main()
