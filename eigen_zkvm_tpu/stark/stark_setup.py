"""STARK preprocessing: const-pol LDE + Merkle commitment + program compile.

(reference: starky/src/stark_setup.rs — const_root is the verification key.)
"""
from __future__ import annotations

import copy

import numpy as np

from ..poly import ntt
from .backends import get_backend
from .starkinfo import Program, StarkInfo


class StarkSetup:
    def __init__(self, const_pols, pil, stark_struct, global_l1=None):
        assert const_pols.nPols == pil.nConstants
        merkle_cls, _ = get_backend(stark_struct.verificationHashType)
        self.const_tree = None
        if stark_struct.verificationHashType == "GL" and pil.nConstants:
            from .engine import Engine

            if Engine(stark_struct.nBitsExt).tpu_commit:
                from ..ops import commit_tpu

                self.const_tree = commit_tpu.tpu_extend_and_merkelize(
                    const_pols.buffer, stark_struct.nBits,
                    stark_struct.nBitsExt)
        if self.const_tree is None:
            lde = ntt.interpolate(const_pols.buffer, stark_struct.nBits,
                                  stark_struct.nBitsExt) \
                if pil.nConstants \
                else np.zeros((1 << stark_struct.nBitsExt, 0), dtype=np.uint64)
            self.const_tree = merkle_cls().merkelize(
                lde, const_pols.nPols, 1 << stark_struct.nBitsExt)
        self.const_root = self.const_tree.root()
        # starkinfo mutates the PIL (adds im/q commitments, idQ tags);
        # compile a private copy so the caller's PIL stays reusable
        si = StarkInfo(copy.deepcopy(pil), stark_struct, global_l1)
        self.starkinfo = si
        self.program: Program = si.program

    # ---- checkpoint / resume (reference stark_setup.rs serde: the setup,
    # with const_root as the verification key, is a reusable artifact) ----

    def save(self, path: str):
        """Persist the full preprocessing output (const tree + compiled
        starkinfo/program) so repeated proving runs skip setup."""
        import pickle

        with open(path, "wb") as f:
            pickle.dump(self, f, protocol=pickle.HIGHEST_PROTOCOL)

    @staticmethod
    def load(path: str) -> "StarkSetup":
        import pickle

        with open(path, "rb") as f:
            obj = pickle.load(f)
        assert isinstance(obj, StarkSetup)
        return obj
