"""Buddy sub-allocator: split/merge/alignment behavior (the analogue of the
reference's pure-logic allocator tests, vk_buffers_suballocator.rs:307-331,
plus allocate/free coverage mirroring its device tests :333-465)."""
import numpy as np
import pytest

from tpurt.utils.pool import BuddySubAllocator


@pytest.fixture(params=["python", "native"])
def make(request):
    def f(total, min_block=128):
        a = BuddySubAllocator(total, min_block,
                              force_python=(request.param == "python"))
        if request.param == "native" and a._native is None:
            pytest.skip("native lib unavailable")
        return a
    return f


def test_split_produces_buddies(make):
    a = make(2048, 128)
    off = a.allocate(128)
    assert off == 0 or off % 128 == 0
    # after splitting the 2048 root down to 128, every level holds one buddy
    assert a.free_bytes() == 2048 - 128


def test_merge_restores_root(make):
    a = make(2048, 128)
    offs = [a.allocate(128) for _ in range(16)]
    assert sorted(offs) == list(range(0, 2048, 128))
    assert a.free_bytes() == 0
    with pytest.raises(MemoryError):
        a.allocate(128)
    for off in offs:
        a.free(off)
    assert a.free_bytes() == 2048
    # root restored: a full-size allocation succeeds again
    assert a.allocate(2048) == 0


def test_alignment_and_sizes(make):
    a = make(1 << 16, 256)
    off = a.allocate(300, alignment=1024)
    assert off % 1024 == 0
    off2 = a.allocate(257)  # rounds to 512 block
    assert off2 % 512 == 0


def test_double_free_rejected(make):
    a = make(1024, 128)
    off = a.allocate(128)
    a.free(off)
    with pytest.raises((ValueError,)):
        a.free(off)


def test_native_matches_python_sequence():
    """Uniform-size churn: free-space accounting must match exactly between
    the native and Python implementations (with mixed sizes the pick order
    legitimately produces different fragmentation)."""
    rng = np.random.default_rng(0)
    py = BuddySubAllocator(1 << 14, 128, force_python=True)
    nat = BuddySubAllocator(1 << 14, 128)
    if nat._native is None:
        pytest.skip("native lib unavailable")
    live_py, live_nat = [], []
    for step in range(300):
        if live_py and (rng.random() < 0.4 or step > 250):
            i = int(rng.integers(0, len(live_py)))
            py.free(live_py.pop(i))
            nat.free(live_nat.pop(i))
        else:
            try:
                o1 = py.allocate(256)
                ok1 = True
            except MemoryError:
                ok1 = False
            try:
                o2 = nat.allocate(256)
                ok2 = True
            except MemoryError:
                ok2 = False
            assert ok1 == ok2
            if ok1:
                live_py.append(o1)
                live_nat.append(o2)
        assert py.free_bytes() == nat.free_bytes()
