"""The hybrid (compaction-free) scan must equal the oracle and the sort-based
scan on every corpus, including heavy-N and boundary cases."""
import numpy as np
import pytest

from seqwin_tpu.engine.hybrid import scan_records_hybrid
from seqwin_tpu.engine.minimizer import scan_records_host
from seqwin_tpu.ops import oracle


def _random_codes(rng, n, n_frac=0.0, run_frac=0.0):
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    if n_frac > 0:
        codes[rng.random(n) < n_frac] = 255
    if run_frac > 0:
        n_runs = max(1, int(n * run_frac / 20))
        for _ in range(n_runs):
            s = int(rng.integers(0, n))
            codes[s:s + int(rng.integers(1, 40))] = 255
    return codes


def _oracle_stream(records, k, w):
    oh, pos, rec = [], [], []
    for ri, codes in enumerate(records):
        for _, o, p in oracle.minimize(codes, k, w):
            oh.append(o)
            pos.append(p)
            rec.append(ri)
    return (
        np.array(oh, dtype=np.uint64),
        np.array(pos, dtype=np.uint32),
        np.array(rec, dtype=np.int32),
    )


@pytest.mark.parametrize('k,w', [(7, 10), (17, 10), (21, 200), (4, 3), (8, 1), (5, 64), (1, 4), (1, 16)])
def test_hybrid_matches_oracle(k, w):
    rng = np.random.default_rng(k * 31 + w)
    records = [
        _random_codes(rng, n, f, r)
        for n, f, r in [
            (500, 0.0, 0.0), (1500, 0.02, 0.0), (30, 0.0, 0.0),
            (k + w - 2, 0.0, 0.0), (2048, 0.0, 0.3), (4000, 0.05, 0.1),
        ]
    ]
    e = _oracle_stream(records, k, w)
    got = scan_records_hybrid(records, k, w)
    for a, b in zip(got, e):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize('seed', range(6))
def test_hybrid_matches_sort_engine_random(seed):
    rng = np.random.default_rng(seed)
    k = int(rng.integers(3, 25))
    w = int(rng.integers(1, 80))
    records = [
        _random_codes(rng, int(rng.integers(10, 3000)), 0.03, 0.2)
        for _ in range(int(rng.integers(1, 8)))
    ]
    a = scan_records_host(records, k, w)
    b = scan_records_hybrid(records, k, w)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_hybrid_edge_patterns():
    k, w = 11, 16
    rng = np.random.default_rng(99)
    records = []
    # N run exactly at a window boundary; record starting/ending with Ns;
    # alternating short valid islands smaller than w
    c = _random_codes(rng, 2000)
    c[500:520] = 255
    c[516:700] = c[516:700]  # noop
    records.append(c)
    c2 = np.full(800, 255, dtype=np.uint8)
    c2[100:180] = rng.integers(0, 4, 80)
    c2[200:260] = rng.integers(0, 4, 60)
    c2[300:700] = rng.integers(0, 4, 400)
    records.append(c2)
    c3 = _random_codes(rng, 64)
    records.append(c3)
    e = _oracle_stream(records, k, w)
    got = scan_records_hybrid(records, k, w)
    for a, b in zip(got, e):
        np.testing.assert_array_equal(a, b)


def test_build_uses_hybrid_and_matches_golden(ref_fixtures, fixture_paths, monkeypatch):
    import numpy as np

    from seqwin_tpu.graph import build

    golden = np.load(ref_fixtures / 'expected' / 'graph.npz')
    monkeypatch.setenv('SEQWIN_TPU_SCAN', 'hybrid')
    kmers, nodes, edges, offsets, _ = build(
        fixture_paths, 17, 10, [True, True, False, False],
    )
    np.testing.assert_array_equal(kmers, golden['kmers'])
    np.testing.assert_array_equal(edges, golden['edges'])
    for f in ('hash', 'start', 'stop', 'n_tar', 'n_neg'):
        np.testing.assert_array_equal(nodes[f], golden['nodes'][f])


def test_hybrid_empty_and_tiny_records():
    """Zero-length and sub-k records must keep record ordinals aligned
    (duplicate start offsets resolve to the correct record via searchsorted)."""
    k, w = 7, 4
    rng = np.random.default_rng(21)
    records = [
        np.zeros(0, dtype=np.uint8),              # empty first
        rng.integers(0, 4, 500).astype(np.uint8),
        np.zeros(0, dtype=np.uint8),              # empty middle
        rng.integers(0, 4, 3).astype(np.uint8),   # shorter than k
        rng.integers(0, 4, 800).astype(np.uint8),
        np.zeros(0, dtype=np.uint8),              # empty last
    ]
    e = _oracle_stream(records, k, w)
    got = scan_records_hybrid(records, k, w)
    for a, b in zip(got, e):
        np.testing.assert_array_equal(a, b)


def test_rank_extraction_matches_topk(monkeypatch):
    """SEQWIN_TPU_EXTRACT=rank (cumsum + searchsorted extraction) must emit
    byte-identical streams to the default two-level top_k."""
    import os

    import numpy as np

    from seqwin_tpu.engine.hybrid import scan_records_hybrid

    rng = np.random.default_rng(33)
    records = []
    for n in (5000, 700, 123, 9000):
        c = rng.integers(0, 4, size=n).astype(np.uint8)
        c[rng.random(n) < 0.01] = 255
        records.append(c)

    monkeypatch.delenv('SEQWIN_TPU_EXTRACT', raising=False)
    base = scan_records_hybrid(records, 17, 10)
    monkeypatch.setenv('SEQWIN_TPU_EXTRACT', 'rank')
    rank = scan_records_hybrid(records, 17, 10)
    for a, b in zip(base, rank):
        np.testing.assert_array_equal(a, b)


def test_pfx_extraction_matches_topk(monkeypatch):
    """SEQWIN_TPU_EXTRACT=pfx (emission scan folded into phase 1: tile
    staircases + sparse-side patch merge, `scan_phase2_pfx`) must emit
    byte-identical streams to the default two-level top_k -- including
    irregular windows from N runs and record starts."""
    import numpy as np

    from seqwin_tpu.engine.hybrid import scan_records_hybrid

    for seed in range(4):
        rng = np.random.default_rng(100 + seed)
        k = int(rng.integers(3, 18))
        w = int(rng.integers(2, 30))
        records = []
        for n in rng.integers(1, 6000, size=int(rng.integers(1, 6))):
            c = rng.integers(0, 4, size=int(n)).astype(np.uint8)
            c[rng.random(int(n)) < 0.01] = 255
            if n > 60:
                a = int(rng.integers(0, n - 30))
                c[a:a + int(rng.integers(1, 25))] = 255
            records.append(c)
        monkeypatch.delenv('SEQWIN_TPU_EXTRACT', raising=False)
        base = scan_records_hybrid(records, k, w)
        monkeypatch.setenv('SEQWIN_TPU_EXTRACT', 'pfx')
        pfx = scan_records_hybrid(records, k, w)
        for a, b in zip(base, pfx):
            np.testing.assert_array_equal(a, b, err_msg=f'seed {seed} k={k} w={w}')


def test_pfx_kernel_matches_emulation():
    """The Mosaic 'pfx' ladders (in-kernel prefix-max + local ranks) must be
    bit-equal to the XLA emulation `pfx_from_z` on the same padded stream
    (interpret mode; the compiled kernel is gated on real TPU in
    tests/run_tpu_smoke.py)."""
    import jax.numpy as jnp
    import numpy as np

    from seqwin_tpu.engine.hybrid import pfx_from_z
    from seqwin_tpu.engine.pallas_scan import L, pallas_phase1, phase1_shapes

    rng = np.random.default_rng(5)
    k, w = 9, 12
    total = 70_000
    codes = rng.integers(0, 4, total).astype(np.uint8)
    codes[rng.random(total) < 0.005] = 255
    codes[0] |= 64
    rtotal, n, offset = phase1_shapes(total, k, w, tb=512)
    stream = np.full(n, 255, dtype=np.uint8)
    stream[offset:offset + total] = codes
    arr = jnp.asarray(stream).reshape(rtotal, L)
    z, _, _ = pallas_phase1(arr, k, w, interpret=True, with_hashes=False)
    tail = n - z.shape[0]
    if tail:
        z = jnp.concatenate([z, jnp.full((tail,), jnp.int32(-1))])
    zp_e, lr_e = pfx_from_z(z, offset, 512 * L)
    zp_k, lr_k = pallas_phase1(
        arr, k, w, interpret=True, with_hashes=False, out='pfx')
    # the emulation pads the trailing halo rows into one extra (empty) tile
    T = np.asarray(zp_k).shape[0]
    np.testing.assert_array_equal(np.asarray(zp_k), np.asarray(zp_e)[:T])
    np.testing.assert_array_equal(np.asarray(lr_k), np.asarray(lr_e)[:T])
    assert (np.asarray(zp_e)[T:] == -1).all()
    assert (np.asarray(lr_e)[T:] == 0).all()


def test_pfx_extraction_edge_cases(monkeypatch):
    """Targeted pfx-vs-topk edges: all-N, sub-window records, constant
    sequences (all ties), blockers at stream/tile boundaries, a whole
    kernel tile of Ns, empty records."""
    import numpy as np

    from seqwin_tpu.engine.hybrid import scan_chunk_device

    def run(extract, records, k, w):
        monkeypatch.setenv('SEQWIN_TPU_EXTRACT', extract)
        r = scan_chunk_device(records, k, w, min_chunk=1 << 12)
        monkeypatch.delenv('SEQWIN_TPU_EXTRACT')
        if r[0] is None:
            return None
        return tuple(np.asarray(x) for x in (r[0], r[1], r[2], r[4])) + (int(r[3]),)

    rng = np.random.default_rng(0)
    k, w = 5, 4
    nb = rng.integers(0, 4, 140_000).astype(np.uint8)
    nb[65530:65545] = 255
    tile_n = rng.integers(0, 4, 140_000).astype(np.uint8)
    tile_n[65536:131072] = 255
    alt = rng.integers(0, 4, 400).astype(np.uint8)
    alt[::2] = 255
    polyn = np.zeros(500, np.uint8)
    polyn[250] = 255
    cases = [
        (k, w, [np.full(100, 255, np.uint8)]),
        (k, w, [rng.integers(0, 4, k + w - 1).astype(np.uint8)]),
        (k, w, [rng.integers(0, 4, k + w - 2).astype(np.uint8)]),
        (k, w, [np.zeros(500, np.uint8)]),
        (k, w, [polyn]),
        (k, w, [alt]),
        (k, w, [rng.integers(0, 4, 200).astype(np.uint8),
                np.zeros(0, np.uint8),
                rng.integers(0, 4, 200).astype(np.uint8)]),
        (9, 300, [rng.integers(0, 4, 1000).astype(np.uint8)]),
        (9, 12, [nb]),
        (9, 12, [tile_n]),
    ]
    for kk, ww, records in cases:
        a = run('topk', records, kk, ww)
        b = run('pfx', records, kk, ww)
        if a is None or b is None:
            assert a is None and b is None
            continue
        assert a[4] == b[4]
        for x, y in zip(a[:4], b[:4]):
            np.testing.assert_array_equal(x, y)


def test_pfx_overflow_with_patch_suppression_forces_retry():
    """When the CLEAN emission count alone exceeds emit_cap, patch
    suppressions must not pull the reported count back under the cap -- the
    bookkeeping only covers the first emit_cap clean emissions, so accepting
    such a result would return a corrupt tail (round-3 review finding #1)."""
    import jax.numpy as jnp
    import numpy as np

    from seqwin_tpu.engine.hybrid import pfx_from_z, scan_phase2_pfx

    n = 1 << 12
    ts = 1 << 10
    emit_cap = 32
    # strictly increasing z -> 39 clean emissions; position 5 is a patched
    # (irregular) window, so its kernel z is -1
    z = np.full(n, -1, np.int32)
    z[:40] = np.arange(40)
    z[5] = -1
    zpfx, lrank = pfx_from_z(jnp.asarray(z), 0, ts)
    # the patch at position 5 has value 35: suppresses clean values 6..35
    pcap = 256
    patch_pos = np.full(pcap, n, np.int32)
    patch_z = np.full(pcap, -1, np.int32)
    patch_pos[0] = 5
    patch_z[0] = 35
    starts = jnp.asarray(np.array([0, n], np.int32))
    asm_tab = jnp.zeros(2, jnp.int32)
    codes = jnp.zeros(n, jnp.uint8)
    _, _, _, count, _ = scan_phase2_pfx(
        zpfx, lrank, codes, jnp.asarray(patch_pos), jnp.asarray(patch_z),
        starts, jnp.int32(0), asm_tab, emit_cap, 3, 0, ts)
    assert int(count) > emit_cap, (
        f'count {int(count)} must force the emit-cap retry')
    # with a sufficient cap the result is exact: 0..4, the patch's 35
    # (suppressing clean 6..35), then 36..39
    e_oh, e_pos, e_rec, count2, _ = scan_phase2_pfx(
        zpfx, lrank, codes, jnp.asarray(patch_pos), jnp.asarray(patch_z),
        starts, jnp.int32(0), asm_tab, 64, 3, 0, ts)
    assert int(count2) == 10, int(count2)
    got = np.asarray(e_pos)[np.asarray(e_rec) >= 0]
    np.testing.assert_array_equal(
        got, np.array([0, 1, 2, 3, 4, 35, 36, 37, 38, 39]))
