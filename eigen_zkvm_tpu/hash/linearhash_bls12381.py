"""BLS12-381 linear hash — bindings of linearhash_big to poseidon_bls12381."""
from __future__ import annotations

import functools

from . import linearhash_big as _big
from . import poseidon_bls12381 as _pbn

P = _pbn.P
pack_gl4 = functools.partial(_big.pack_gl4, _pbn)
pack_gl3 = functools.partial(_big.pack_gl3, _pbn)
hash_element_array = functools.partial(_big.hash_element_array, _pbn)
hash_element_matrix = functools.partial(_big.hash_element_matrix, _pbn)
hash_node = functools.partial(_big.hash_node, _pbn)
