"""Marker-stage unit tests + synthetic full-pipeline equivalence."""
import numpy as np
import pytest

from seqwin_tpu.graph.hashgraph import HashGraph, OrderedKmers
from seqwin_tpu.pipeline.markers import MarkerLoc, _get_graph_order, _get_loc, _get_rep_order


def test_get_loc_runs_and_largest_group():
    # two assemblies; assembly 0 has two runs (pos gap > 1.5*w), the larger wins
    w, k = 10, 5
    hashes = np.array([11, 12, 13, 11, 12, 21, 22], dtype=np.uint64)
    pos = np.array([100, 108, 119, 500, 505, 50, 58], dtype=np.int64)
    asm = np.array([0, 0, 0, 0, 0, 1, 1], dtype=np.int64)
    rec = np.array([0, 0, 0, 0, 0, 0, 0], dtype=np.int64)
    locs = _get_loc((hashes, pos, asm, rec), k, w, n_tar=1)
    assert len(locs) == 2
    a0 = locs[0]
    assert a0.assembly_idx == 0
    assert a0.n_kmers == 3
    assert a0.n_repeats == 2
    assert a0.start == 100
    assert a0.stop == 119 + k
    assert a0.kmers == (11, 12, 13)
    assert a0.is_target
    a1 = locs[1]
    assert a1.n_kmers == 2 and not a1.is_target


def test_get_loc_record_boundary_splits_groups():
    # small positive gap across a record boundary must still split
    w, k = 10, 5
    hashes = np.array([1, 2, 3, 4], dtype=np.uint64)
    pos = np.array([100, 110, 112, 120], dtype=np.int64)
    asm = np.array([0, 0, 0, 0], dtype=np.int64)
    rec = np.array([0, 0, 1, 1], dtype=np.int64)
    locs = _get_loc((hashes, pos, asm, rec), k, w, n_tar=1)
    assert len(locs) == 1
    assert locs[0].n_repeats == 2
    assert locs[0].n_kmers == 2


def _mk_loc(kmers, is_target=True):
    return MarkerLoc(0, 0, 0, 10, len(kmers), tuple(kmers), is_target, 1, 10)


def test_rep_order_canonical_and_orientation():
    warnings = set()
    locs = [
        _mk_loc((1, 2, 3)),
        _mk_loc((3, 2, 1)),
        _mk_loc((3, 2, 1)),
        _mk_loc((9, 9), is_target=False),  # non-target ignored
    ]
    rep, n_rep = _get_rep_order(locs, warnings)
    # canonical of both is (1,2,3); majority orientation is (3,2,1)
    assert tuple(rep) == (3, 2, 1)
    assert n_rep == 3
    assert not warnings


def test_rep_order_warnings():
    warnings = set()
    rep, _ = _get_rep_order([_mk_loc((5,))], warnings)
    assert 'single' in warnings
    warnings = set()
    rep, _ = _get_rep_order([_mk_loc((5, 5, 6))], warnings)
    assert 'dup' in warnings


def test_graph_order_linear_and_nonlinear():
    g = HashGraph()
    g.add_edges([(1, 2), (2, 3), (3, 4)])
    warnings = set()
    order = _get_graph_order(g, OrderedKmers((1, 2, 3, 4)), warnings)
    assert tuple(order) == (1, 2, 3, 4)
    assert not warnings

    # reversed rep -> orientation flip
    warnings = set()
    order = _get_graph_order(g, OrderedKmers((4, 3, 2, 1)), warnings)
    assert tuple(order) == (4, 3, 2, 1)

    # star graph: not linear
    g2 = HashGraph()
    g2.add_edges([(1, 2), (1, 3), (1, 4)])
    warnings = set()
    assert _get_graph_order(g2, OrderedKmers((1, 2)), warnings) is None
    assert 'non-linear' in warnings


def _write_random_fastas(tmp_path, rng, n_tar=3, n_neg=3, n_len=6000):
    """Targets share a conserved core with unique insert; negs are random."""
    alphabet = np.array(list('ACGT'))
    core = ''.join(rng.choice(alphabet, 2000))
    sig = ''.join(rng.choice(alphabet, 600))
    paths, targets = [], []
    for i in range(n_tar):
        noise1 = ''.join(rng.choice(alphabet, 1500))
        noise2 = ''.join(rng.choice(alphabet, 1500))
        seq = noise1 + core + sig + noise2
        p = tmp_path / f'tar{i}.fasta'
        p.write_text(f'>t{i}\n{seq}\n')
        paths.append(p)
        targets.append(True)
    for i in range(n_neg):
        seq = ''.join(rng.choice(alphabet, n_len)) + core[:500]
        p = tmp_path / f'neg{i}.fasta'
        p.write_text(f'>n{i}\n{seq}\n')
        paths.append(p)
        targets.append(False)
    return paths, targets


def test_full_pipeline_backend_equivalence(tmp_path):
    """The XLA and oracle backends must produce identical signatures end to
    end on a synthetic dataset (wider coverage than the smoke fixtures)."""
    from seqwin_tpu.config import Config
    from seqwin_tpu.core import run

    rng = np.random.default_rng(5)
    data_dir = tmp_path / 'data'
    data_dir.mkdir()
    paths, targets = _write_random_fastas(data_dir, rng)
    tar_txt = tmp_path / 'tar.txt'
    neg_txt = tmp_path / 'neg.txt'
    tar_txt.write_text('\n'.join(str(p) for p, t in zip(paths, targets) if t))
    neg_txt.write_text('\n'.join(str(p) for p, t in zip(paths, targets) if not t))

    outputs = {}
    for backend in ('xla', 'numpy'):
        cfg = Config(
            tar_paths=tar_txt, neg_paths=neg_txt, prefix=tmp_path,
            title=f'run-{backend}', kmerlen=15, windowsize=12, min_len=100,
            run_mash=False, run_blast=False, device_backend=backend, n_cpu=1,
        )
        run(cfg)
        outputs[backend] = (tmp_path / f'run-{backend}' / 'signatures.fasta').read_text()
    assert outputs['xla'] == outputs['numpy']
    assert outputs['xla'].startswith('>')
