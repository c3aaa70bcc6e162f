"""On-device MinHash sketch estimator."""
import numpy as np

from seqwin_tpu.mash import device_sketches, sketch_jaccard_matrix


def test_device_jaccard_identical_and_disjoint():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 4, 5000).astype(np.uint8)
    b = rng.integers(0, 4, 5000).astype(np.uint8)
    sketches = device_sketches([[a], [a.copy()], [b]], kmerlen=15, sketchsize=500)
    j = sketch_jaccard_matrix(sketches, 500)
    assert j[0, 1] == 1.0  # identical genomes
    assert j[0, 0] == 1.0
    assert j[0, 2] < 0.05  # unrelated genomes
    assert np.allclose(j, j.T)


def test_device_jaccard_mutated_clone():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 4, 20000).astype(np.uint8)
    b = a.copy()
    idx = rng.integers(0, len(b), 60)  # ~0.3% SNPs
    b[idx] = (b[idx] + 1) % 4
    sketches = device_sketches([[a], [b]], kmerlen=15, sketchsize=1000)
    j = sketch_jaccard_matrix(sketches, 1000)
    assert 0.5 < j[0, 1] < 1.0


def test_sketch_mode_device_pipeline(tmp_path):
    from seqwin_tpu.config import Config
    from seqwin_tpu.core import run

    rng = np.random.default_rng(3)
    alphabet = np.array(list('ACGT'))
    core = ''.join(rng.choice(alphabet, 3000))
    paths = []
    for i in range(4):
        noise = ''.join(rng.choice(alphabet, 2000))
        seq = core + noise if i < 2 else noise + ''.join(rng.choice(alphabet, 3000))
        p = tmp_path / f'g{i}.fasta'
        p.write_text(f'>g{i}\n{seq}\n')
        paths.append(p)
    tar = tmp_path / 'tar.txt'
    neg = tmp_path / 'neg.txt'
    tar.write_text('\n'.join(map(str, paths[:2])))
    neg.write_text('\n'.join(map(str, paths[2:])))
    cfg = Config(
        tar_paths=tar, neg_paths=neg, prefix=tmp_path, title='dev-sketch',
        kmerlen=15, windowsize=12, min_len=100, run_blast=False,
        sketch_mode='device', n_cpu=1,
    )
    run(cfg)
    out = (tmp_path / 'dev-sketch' / 'signatures.fasta').read_text()
    assert out.startswith('>')
