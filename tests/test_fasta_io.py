"""FASTA ingest: native C++ scanner vs NumPy parser vs parsing edge cases."""
import gzip

import numpy as np
import pytest

from seqwin_tpu.io.fasta import load_fasta, parse_fasta_codes, parse_fasta_codes_py
from seqwin_tpu.io import native

EDGE_CASES = {
    'simple': '>r1 desc\nACGT\nacgt\n>r2\nNNNACGT\n',
    'crlf': '>r1 desc\r\nAC GT\r\n\r\n>r2\tx\r\nTTTT\r\n',
    'blank_lines': '\n\n>r1\n\nACGT\n\n\n>r2\nGG  GG\n',
    'no_trailing_newline': '>r1\nACGT',
    'lowercase_u': '>r1\nacguACGU\n',
    'weird_chars': '>r1\nACGTXYZ-123acgt\n',
    'header_only': '>lonely\n>second\nACGT\n',
    'long_header': '>id|with|pipes extra words here\nACGT\n',
    'empty_file': '',
}


@pytest.mark.parametrize('name', sorted(EDGE_CASES))
def test_native_matches_numpy(tmp_path, name):
    text = EDGE_CASES[name]
    p = tmp_path / f'{name}.fasta'
    p.write_text(text)
    py_ids, py_codes = parse_fasta_codes_py(p)
    if not native.available():
        pytest.skip('native ingest unavailable')
    nat = native.parse_fasta_codes_native(p)
    assert nat is not None
    nat_ids, nat_codes = nat
    assert nat_ids == py_ids
    assert len(nat_codes) == len(py_codes)
    for a, b in zip(nat_codes, py_codes):
        np.testing.assert_array_equal(a, b)

    # gz variant
    gz = tmp_path / f'{name}.fasta.gz'
    gz.write_bytes(gzip.compress(text.encode()))
    gz_ids, gz_codes = parse_fasta_codes(gz)
    assert gz_ids == py_ids
    for a, b in zip(gz_codes, py_codes):
        np.testing.assert_array_equal(a, b)


def test_sequence_before_header_raises(tmp_path):
    p = tmp_path / 'bad.fasta'
    p.write_text('ACGT\n>r1\nACGT\n')
    with pytest.raises(ValueError):
        parse_fasta_codes_py(p)
    if native.available():
        with pytest.raises(ValueError):
            native.parse_fasta_codes_native(p)


def test_load_fasta_mirrors_reference_loader(tmp_path):
    # only '\n' is stripped from bodies, and the result is upper-cased
    p = tmp_path / 'x.fasta'
    p.write_text('>r1 d\nac gt\nACGT\n>r2\nTT\n')
    seqs = load_fasta(p)
    assert seqs == ('AC GTACGT', 'TT')


def test_parse_on_reference_fixture(ref_fixtures):
    p = ref_fixtures / 'targets' / 'target-1.fasta'
    ids, codes = parse_fasta_codes(p)
    ids_py, codes_py = parse_fasta_codes_py(p)
    assert ids == ids_py
    for a, b in zip(codes, codes_py):
        np.testing.assert_array_equal(a, b)
    assert ids[0].startswith('NR_')
