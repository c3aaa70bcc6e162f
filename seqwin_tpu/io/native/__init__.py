"""ctypes binding for the native FASTA ingest, with transparent build+fallback.

The shared library is compiled on first use with the system toolchain and
cached next to this package. Any failure (no compiler, no zlib) silently
falls back to the NumPy parser in `io/fasta.py` -- both implement the same
contract and are differential-tested against each other.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile
import threading
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / 'fastacodes.cpp'
_LIB_PATH = _HERE / '_fastacodes.so'
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build_library() -> Path | None:
    try:
        with tempfile.TemporaryDirectory() as td:
            tmp_so = Path(td) / '_fastacodes.so'
            cmd = [
                'g++', '-O3', '-std=c++17', '-shared', '-fPIC',
                str(_SRC), '-o', str(tmp_so), '-lz',
            ]
            subprocess.run(cmd, check=True, capture_output=True)
            data = tmp_so.read_bytes()
        tmp_out = _LIB_PATH.with_suffix(f'.so.tmp{os.getpid()}')
        tmp_out.write_bytes(data)
        os.replace(tmp_out, _LIB_PATH)
        return _LIB_PATH
    except Exception as e:  # no compiler / no zlib / read-only fs
        logger.debug(f'native ingest build failed, using NumPy parser: {e}')
        return None


def _load() -> ctypes.CDLL | None:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        path = _LIB_PATH
        if not path.exists() or path.stat().st_mtime < _SRC.stat().st_mtime:
            built = _build_library()
            if built is None:
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(path))
            _register(lib)
        except (OSError, AttributeError) as e:
            # AttributeError: a stale cached .so predating a new symbol --
            # rebuild once, then fall back silently (module contract)
            logger.debug(f'native ingest load failed ({e}); rebuilding')
            if _build_library() is not None:
                try:
                    lib = ctypes.CDLL(str(_LIB_PATH))
                    _register(lib)
                except (OSError, AttributeError) as e2:
                    logger.debug(f'native ingest rebuild load failed: {e2}')
                    _lib_failed = True
                    return None
            else:
                _lib_failed = True
                return None
        _lib = lib
        return _lib


# must match fastacodes.cpp::sq_abi_version(); bump together on any layout
# change that keeps old symbols loadable (the mtime check alone cannot catch
# a stale .so copied with preserved timestamps)
_ABI_VERSION = 2


def _register(lib: ctypes.CDLL) -> None:
    lib.sq_abi_version.restype = ctypes.c_uint64  # AttributeError if stale
    got = int(lib.sq_abi_version())
    if got != _ABI_VERSION:
        raise AttributeError(
            f'native library ABI {got} != expected {_ABI_VERSION} (stale build)')
    lib.sq_parse.restype = ctypes.c_void_p
    lib.sq_parse.argtypes = [ctypes.c_char_p]
    lib.sq_error.restype = ctypes.c_char_p
    lib.sq_error.argtypes = [ctypes.c_void_p]
    lib.sq_n_records.restype = ctypes.c_uint64
    lib.sq_n_records.argtypes = [ctypes.c_void_p]
    lib.sq_total_bases.restype = ctypes.c_uint64
    lib.sq_total_bases.argtypes = [ctypes.c_void_p]
    lib.sq_codes.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.sq_codes.argtypes = [ctypes.c_void_p]
    lib.sq_offsets.restype = ctypes.POINTER(ctypes.c_uint64)
    lib.sq_offsets.argtypes = [ctypes.c_void_p]
    lib.sq_record_id.restype = ctypes.c_char_p
    lib.sq_record_id.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.sq_free.argtypes = [ctypes.c_void_p]
    _layout_args = [
        ctypes.POINTER(ctypes.c_void_p),  # recs
        ctypes.POINTER(ctypes.c_uint64),  # lens
        ctypes.c_uint64,                  # n_recs
        ctypes.POINTER(ctypes.c_uint8),   # buf
        ctypes.c_uint64,                  # n
        ctypes.c_uint64,                  # offset
        ctypes.POINTER(ctypes.c_int64),   # starts_out
        ctypes.POINTER(ctypes.c_int64),   # inv_out
        ctypes.c_uint64,                  # inv_cap
    ]
    lib.sq_layout_chunk.restype = ctypes.c_uint64
    lib.sq_layout_chunk.argtypes = _layout_args
    lib.sq_layout_chunk_packed.restype = ctypes.c_uint64
    lib.sq_layout_chunk_packed.argtypes = _layout_args
    lib.sq_expand_kmers_nodes.restype = None
    lib.sq_expand_kmers_nodes.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),   # buf
        ctypes.c_uint64, ctypes.c_uint64,  # m, n_nodes
        ctypes.c_uint64, ctypes.c_uint64,  # mq, nq
        ctypes.POINTER(ctypes.c_uint8),   # kmers_out
        ctypes.POINTER(ctypes.c_uint8),   # nodes_out
        ctypes.c_uint64,                  # stream_m (last node's stop)
    ]
    lib.sq_expand_edges.restype = None
    lib.sq_expand_edges.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),   # buf
        ctypes.c_uint64, ctypes.c_uint64,  # n_edges, eq
        ctypes.POINTER(ctypes.c_uint8),   # edges_out
    ]
    _canon_args = [
        ctypes.POINTER(ctypes.c_uint8),   # codes / packed
        ctypes.POINTER(ctypes.c_int64),   # positions
        ctypes.c_uint64, ctypes.c_uint64,  # n, k
        ctypes.POINTER(ctypes.c_uint64),  # fwd_tab [k, 5]
        ctypes.POINTER(ctypes.c_uint64),  # rev_tab [k, 5]
        ctypes.POINTER(ctypes.c_uint64),  # out
    ]
    lib.sq_canon_at.restype = None
    lib.sq_canon_at.argtypes = _canon_args
    lib.sq_canon_at_packed.restype = None
    lib.sq_canon_at_packed.argtypes = _canon_args


def available() -> bool:
    return _load() is not None


def layout_chunk(record_codes, n: int, offset: int):
    """Native chunk layout: concatenated augmented codes (bit6 = record start),
    record start offsets, and invalid-base positions. None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    n_recs = len(record_codes)
    recs = (ctypes.c_void_p * n_recs)()
    lens = (ctypes.c_uint64 * n_recs)()
    keepalive = []
    total = 0
    for i, c in enumerate(record_codes):
        c = np.ascontiguousarray(c, dtype=np.uint8)
        keepalive.append(c)
        recs[i] = c.ctypes.data
        lens[i] = len(c)
        total += len(c)
    buf = np.empty(n, dtype=np.uint8)
    starts = np.empty(n_recs, dtype=np.int64)
    inv_cap = max(1024, total // 16)
    while True:
        inv = np.empty(inv_cap, dtype=np.int64)
        n_inv = lib.sq_layout_chunk(
            recs, lens, n_recs,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, offset,
            starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            inv.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), inv_cap,
        )
        if n_inv <= inv_cap:
            return buf, starts, inv[:n_inv]
        inv_cap = int(n_inv)


def layout_chunk_packed(record_codes, n: int, offset: int):
    """Native packed chunk layout: 2-bit codes (4/byte), record starts, and
    invalid-base positions. None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    assert n % 4 == 0
    n_recs = len(record_codes)
    recs = (ctypes.c_void_p * n_recs)()
    lens = (ctypes.c_uint64 * n_recs)()
    keepalive = []
    total = 0
    for i, c in enumerate(record_codes):
        c = np.ascontiguousarray(c, dtype=np.uint8)
        keepalive.append(c)
        recs[i] = c.ctypes.data
        lens[i] = len(c)
        total += len(c)
    packed = np.empty(n // 4, dtype=np.uint8)
    starts = np.empty(n_recs, dtype=np.int64)
    inv_cap = max(1024, total // 16)
    while True:
        inv = np.empty(inv_cap, dtype=np.int64)
        n_inv = lib.sq_layout_chunk_packed(
            recs, lens, n_recs,
            packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, offset,
            starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            inv.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), inv_cap,
        )
        if n_inv <= inv_cap:
            return packed, starts, inv[:n_inv]
        inv_cap = int(n_inv)


def parse_fasta_codes_native(path) -> tuple[list[str], list[np.ndarray]] | None:
    """Native-path equivalent of `io.fasta.parse_fasta_codes`.
    Returns None if the native library is unavailable.

    ZERO-COPY: the per-record arrays are read-only views over the parse
    handle's code buffer; a finalizer on the shared ctypes window frees the
    handle once the last view dies. The previous `.copy()` was a full
    dataset-sized host pass (~1.6 s at 800 Mbp on this host's ~500 MB/s
    memcpy; PERF.md round-4 ingest work)."""
    import weakref

    lib = _load()
    if lib is None:
        return None
    h = lib.sq_parse(str(path).encode())
    ok = False
    try:
        err = lib.sq_error(h)
        if err:
            raise ValueError(f'{err.decode()}: {path}')
        n_rec = lib.sq_n_records(h)
        total = lib.sq_total_bases(h)
        ids = [lib.sq_record_id(h, i).decode('utf-8', errors='replace') for i in range(n_rec)]
        if n_rec == 0 or not total:
            return ids, [np.zeros(0, dtype=np.uint8) for _ in range(n_rec)]
        offsets = np.ctypeslib.as_array(lib.sq_offsets(h), shape=(n_rec + 1,)).copy()
        # numpy view over the C++ buffer; views of views collapse their
        # .base to `win`, so the finalizer runs only after every record
        # array (and any slice of one) is garbage
        win = (ctypes.c_uint8 * total).from_address(
            ctypes.addressof(lib.sq_codes(h).contents))
        weakref.finalize(win, lib.sq_free, h)
        ok = True
        codes_flat = np.frombuffer(win, dtype=np.uint8)
        codes_flat.flags.writeable = False
        codes = [codes_flat[offsets[i]:offsets[i + 1]] for i in range(n_rec)]
        return ids, codes
    finally:
        if not ok:
            lib.sq_free(h)


def expand_kmers_nodes(buf: np.ndarray, m: int, n_nodes: int, mq: int,
                       nq: int, kmers: np.ndarray, nodes: np.ndarray,
                       stream_m: int) -> bool:
    """Expand a compact kmers+nodes transfer buffer (u32/u16 column blocks,
    NO stop column -- stop[i] = start[i+1], last stop = ``stream_m``; see
    `engine/aggregate._pack_kmers_nodes_compact`) into the structured
    output arrays. Returns False when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return False
    assert buf.dtype == np.uint8 and buf.flags.c_contiguous
    lib.sq_expand_kmers_nodes(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(m), int(n_nodes), int(mq), int(nq),
        kmers.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        nodes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(stream_m),
    )
    return True


def expand_edges(buf: np.ndarray, n_edges: int, eq: int,
                 edges: np.ndarray) -> bool:
    """Expand a compact edges transfer buffer; see `expand_kmers_nodes`."""
    lib = _load()
    if lib is None:
        return False
    assert buf.dtype == np.uint8 and buf.flags.c_contiguous
    lib.sq_expand_edges(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(n_edges), int(eq),
        edges.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return True


def canon_at(stream: np.ndarray, positions: np.ndarray, k: int,
             fwd_tab: np.ndarray, rev_tab: np.ndarray,
             packed: bool) -> np.ndarray | None:
    """Canonical ntHash at sparse positions via the C kernel (L1-resident
    table XORs; the NumPy gather equivalent measured ~19 us/position on this
    host's slow memory). Returns None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    pos = np.ascontiguousarray(positions, dtype=np.int64)
    stream = np.ascontiguousarray(stream)
    ft = np.ascontiguousarray(fwd_tab, dtype=np.uint64)
    rt = np.ascontiguousarray(rev_tab, dtype=np.uint64)
    out = np.empty(len(pos), dtype=np.uint64)
    fn = lib.sq_canon_at_packed if packed else lib.sq_canon_at
    fn(
        stream.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(pos), int(k),
        ft.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        rt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    return out
