"""RMQ position-semantics tests (values from /root/reference/src/rmq/mod.rs:159-282)."""

from umgap_tpu.agg.rmq import RMQ


def array():
    base = [
        39, 60, 15, 94, 25, 3, 88, 94, 71, 68,
        17, 15, 73, 32, 59, 89, 25, 36, 12, 85,
        80, 94, 56, 30, 62, 3, 10, 58, 69, 56,
        10, 8, 48, 25, 34, 5, 61, 22, 99, 64,
        22, 49, 80, 28, 13, 71, 17, 38, 40, 61,
        55, 20, 55, 43, 82, 49, 78, 24, 8, 47,
        12, 50, 87, 61, 8, 21, 66, 69, 76, 66,
        65, 98, 47, 77, 58, 60, 81, 76, 98, 21,
        69, 85, 73, 25, 29, 88, 74, 7, 12, 14,
        87, 25, 97, 74, 86, 5, 28, 84, 6, 4,
    ]
    return base + base


def test_block_minima():
    # 64-bit word size branch of the reference test: one 34-element array
    # has its global min (1) at index 33.
    arr = [12, 17, 23, 2, 20, 4, 8, 27, 26, 19, 31, 22, 28, 16, 24, 14,
           5, 29, 32, 11, 7, 9, 25, 30, 21, 13, 6, 18, 15, 33, 10, 3,
           33, 1]
    assert RMQ(arr).block_min.tolist() == [33]


def test_rmq_single_block():
    info = RMQ(array())
    assert info.query(0, 9) == 5
    assert info.query(10, 19) == 18


def test_rmq_queries():
    info = RMQ(array())
    assert info.query(0, 39) == 5
    assert info.query(0, 69) == 5
    assert info.query(40, 99) == 99
    assert info.query(0, 99) == 5
    assert info.query(10, 99) == 25
    assert info.query(30, 99) == 99
    assert info.query(30, 140) == 105


def test_rmq_reversed_and_trivial():
    info = RMQ(array())
    assert info.query(99, 40) == 99  # order-insensitive
    assert info.query(7, 7) == 7


def test_wave_of_33():
    arr = [1, 2] + [3, 4] * 31 + [3, 2, 1]
    info = RMQ(arr)
    assert info.query(2, 64) == 2


def test_wave_of_65():
    arr = [1, 2] + [3, 4] * 95 + [3, 2, 1]
    info = RMQ(arr)
    assert info.query(2, 64) == 2
