"""Host-side integer helpers (plan-construction time only)."""

from __future__ import annotations


def cdiv(a: int, b: int) -> int:
    """Ceiling division."""
    return -(-a // b)


def round_up_to_multiple(x: int, m: int) -> int:
    return cdiv(x, m) * m


def _is_smooth(n: int, primes=(2, 3, 5)) -> bool:
    for p in primes:
        while n % p == 0:
            n //= p
    return n == 1


def next_fast_len(n: int, primes=(2, 3, 5)) -> int:
    """Smallest integer >= n whose prime factors are all in `primes`.

    Equivalent of Julia's ``nextprod((2, 3, 5), n)`` used by the reference to
    choose oversampled-grid sizes (reference: src/plan.jl:485-498).  Sizes that
    are products of small primes are also the fast sizes for XLA's TPU FFT.
    """
    if n <= 1:
        return 1
    m = n
    while not _is_smooth(m, primes):
        m += 1
    return m
