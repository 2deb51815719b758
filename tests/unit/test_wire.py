"""2-bit wire format (io/wire.py): roundtrips + N detection."""

import numpy as np

from kmerax.io import wire


def _batch(seed=0, B=64, L=150):
    rng = np.random.default_rng(seed)
    lens = rng.integers(1, L + 1, B).astype(np.int32)
    bases = rng.integers(0, 4, (B, L)).astype(np.int32)
    bases[np.arange(L)[None, :] >= lens[:, None]] = 4
    return bases, lens


def test_h2d_roundtrip_rebuilds_pad():
    bases, lens = _batch()
    p = wire.pack2_host(bases)
    assert p.shape == (64, wire.packed_cols(150))
    up = np.asarray(wire.unpack2_dev(p, lens, 150))
    assert up.dtype == np.int8
    np.testing.assert_array_equal(up, bases)


def test_d2h_roundtrip_within_length():
    bases, lens = _batch(seed=1)
    pd = np.asarray(wire.pack2_dev(bases.astype(np.int8)))
    uh = wire.unpack2_host(pd, 150)
    for i in range(len(lens)):
        np.testing.assert_array_equal(uh[i, : lens[i]],
                                      bases[i, : lens[i]])


def test_odd_length_columns():
    for L in (149, 151, 1, 4):
        bases, lens = _batch(seed=2, L=L)
        up = np.asarray(
            wire.unpack2_dev(wire.pack2_host(bases), lens, L))
        np.testing.assert_array_equal(up, bases)


def test_batch_has_n_distinguishes_pad_from_real_n():
    bases, lens = _batch(seed=3)
    assert not wire.batch_has_n(bases, lens)   # padding 4s only
    withn = bases.copy()
    withn[5, 2] = 4                            # a real in-read N
    assert wire.batch_has_n(withn, lens)
