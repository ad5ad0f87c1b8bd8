"""Example circuits — the starkjs workload suite, authored natively.

Each module exposes build(n_bits) -> (pil, const_pols, make_trace) where
make_trace(inputs) fills the commit PolsArray; mirror of the reference's JS
trace builders (starkjs/{fibonacci,permutation,plookup,connection}/*.js).
"""
