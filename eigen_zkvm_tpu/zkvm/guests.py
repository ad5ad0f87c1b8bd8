"""Example guest programs (the reference's zkvm/program/{lr,evm} analogs).

`fibonacci`: n from the input tape, computes fib(n) mod 2^32 into x3.
`linear_regression`: the reference's lr guest (program/lr/src/lib.rs):
reads n, then n (x, y) pairs from the tape, computes the OLS slope/intercept
numerators/denominator in 32-bit arithmetic:
  sxy_n = n*sum(xy) ; sx_sy = sum(x)*sum(y) ; sxx_n = n*sum(xx) ; sx2 ...
leaving  num = n*sum(xy) - sum(x)*sum(y)  in x5
and      den = n*sum(xx) - sum(x)^2       in x6  (all mod 2^32).
"""

FIBONACCI = """
    in   x1          # n
    li   x2, 0       # a
    li   x3, 1       # b
    li   x4, 0       # i
    li   x5, 1
loop:
    beq  x4, x1, done
    add  x6, x2, x3
    mv   x2, x3
    mv   x3, x6
    add  x4, x4, x5
    j    loop
done:
    halt
"""

LINEAR_REGRESSION = """
    in   x1          # n
    li   x2, 0       # sum x
    li   x3, 0       # sum y
    li   x4, 0       # sum xy
    li   x5, 0       # sum xx
    li   x6, 0       # i
    li   x7, 1
loop:
    beq  x6, x1, fini
    in   x8          # x_i
    in   x9          # y_i
    add  x2, x2, x8
    add  x3, x3, x9
    mul  x10, x8, x9
    add  x4, x4, x10
    mul  x10, x8, x8
    add  x5, x5, x10
    add  x6, x6, x7
    j    loop
fini:
    mul  x10, x1, x4 # n*sum(xy)
    mul  x11, x2, x3 # sum(x)*sum(y)
    sub  x5, x5, x0  # keep sum xx
    mul  x12, x1, x5 # n*sum(xx)
    mul  x13, x2, x2 # sum(x)^2
    sub  x5, x10, x11  # num -> x5
    sub  x6, x12, x13  # den -> x6
    halt
"""

# gcd(a, b) by binary-free Euclid (repeated subtraction with a swap walk):
# reads a, b from the tape, leaves gcd in x2.  Exercises the branch ops
# (blt/bne) and long multi-chunk traces for small inputs.
GCD = """
    in   x2          # a
    in   x3          # b
loop:
    beq  x3, x0, done
    blt  x2, x3, swap
    sub  x2, x2, x3
    j    loop
swap:
    add  x4, x2, x0
    add  x2, x3, x0
    add  x3, x4, x0
    j    loop
done:
    halt
"""

# modular micro-exponentiation base^e mod 2^32 with a unary exponent loop:
# reads base, e; leaves the power in x3.
POW = """
    in   x1          # base
    in   x2          # e
    li   x3, 1
    li   x4, 0
    li   x5, 1
loop:
    beq  x4, x2, done
    mul  x3, x3, x1
    add  x4, x4, x5
    j    loop
done:
    halt
"""
