"""ctypes binding + numpy assembly for the native mmCIF atom tokenizer.

Accelerates the hot 95% of mmCIF preprocessing (the `_atom_site` loop,
often 10^5+ rows) with the C++ tokenizer in `native/mmcif/mmcif_atoms.cc`;
header records stay on the Python parser. `parse_atoms_fast` returns the
same per-chain structures as the pure-Python path, or None when the
native library or the loop isn't usable (caller falls back).
"""
from __future__ import annotations

import ctypes
import os
import re
import subprocess
import threading
from typing import Dict, Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "native", "mmcif", "mmcif_atoms.cc")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libmmcif.so")

_lock = threading.Lock()
_lib = None

_FIELDS = {
    "group_PDB": "col_group",
    "auth_atom_id": "col_atom",
    "label_atom_id": "col_atom_fallback",
    "auth_comp_id": "col_comp",
    "label_comp_id": "col_comp_fallback",
    "auth_asym_id": "col_chain",
    "label_asym_id": "col_chain_fallback",
    "auth_seq_id": "col_seq",
    "label_seq_id": "col_seq_fallback",
    "Cartn_x": "col_x",
    "Cartn_y": "col_y",
    "Cartn_z": "col_z",
    "B_iso_or_equiv": "col_b",
    "label_alt_id": "col_alt",
    "pdbx_PDB_model_num": "col_model",
    "pdbx_PDB_ins_code": "col_icode",
}


def build_library(force: bool = False) -> Optional[str]:
    if os.path.exists(_LIB_PATH) and not force and os.path.getmtime(
        _SRC
    ) <= os.path.getmtime(_LIB_PATH):
        return _LIB_PATH
    os.makedirs(_BUILD_DIR, exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB_PATH],
            check=True,
            capture_output=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return _LIB_PATH


def _load():
    global _lib
    with _lock:
        if _lib is None:
            path = build_library()
            if path is None:
                _lib = False
                return None
            lib = ctypes.CDLL(path)
            i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
            i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            lib.parse_atom_rows.argtypes = (
                [ctypes.c_char_p, ctypes.c_long] + [ctypes.c_int] * 13
                + [i32p, i32p, i8p, i8p, f32p, f32p]
            )
            lib.parse_atom_rows.restype = ctypes.c_long
            _lib = lib
    return _lib or None


_LOOP_RE = re.compile(
    r"loop_\s*\n((?:_atom_site\.[^\n]*\n)+)", re.M
)


def extract_atom_site_region(text: str) -> Optional[Tuple[list, int, int]]:
    """Finds the _atom_site loop; returns (headers, row_start, row_end)."""
    m = _LOOP_RE.search(text)
    if not m:
        return None
    headers = [ln.strip().split()[0] for ln in m.group(1).strip().splitlines()]
    start = m.end(1)
    # Data rows run until the next record-ish line at column 0.
    stop = re.compile(r"^(?:_|loop_|#|data_)", re.M)
    m2 = stop.search(text, start)
    end = m2.start() if m2 else len(text)
    return headers, start, end


def parse_atoms_fast(text: str):
    """Returns (chains dict as in mmcif.ParsedChain fields, (start, end))
    or None if the fast path can't run."""
    lib = _load()
    if lib is None:
        return None
    region = extract_atom_site_region(text)
    if region is None:
        return None
    headers, start, end = region
    names = [h.split(".", 1)[1] for h in headers]
    cols = {v: -1 for v in set(_FIELDS.values())}
    for idx, nm in enumerate(names):
        key = _FIELDS.get(nm)
        if key and cols.get(key, -1) == -1:
            cols[key] = idx

    def pick(primary, fallback):
        return cols[primary] if cols[primary] >= 0 else cols[fallback]

    col_atom = pick("col_atom", "col_atom_fallback")
    col_comp = pick("col_comp", "col_comp_fallback")
    col_chain = pick("col_chain", "col_chain_fallback")
    col_seq = pick("col_seq", "col_seq_fallback")
    if min(col_atom, col_comp, col_chain, col_seq, cols["col_x"]) < 0:
        return None

    row_text = text[start:end].encode()
    max_rows = row_text.count(b"\n") + 1
    chain_ids = np.empty(max_rows, np.int32)
    res_seq = np.empty(max_rows, np.int32)
    atom_idx = np.empty(max_rows, np.int8)
    aatype = np.empty(max_rows, np.int8)
    xyz = np.empty((max_rows, 3), np.float32)
    bfac = np.empty(max_rows, np.float32)

    n = lib.parse_atom_rows(
        row_text, len(row_text), len(headers),
        cols["col_group"], col_atom, col_comp, col_chain, col_seq,
        cols["col_x"], cols["col_y"], cols["col_z"], cols["col_b"],
        cols["col_alt"], cols["col_model"], cols["col_icode"],
        chain_ids, res_seq, atom_idx, aatype, xyz, bfac,
    )
    if n < 0:
        return None

    chains: Dict[str, dict] = {}
    chain_ids, res_seq = chain_ids[:n], res_seq[:n]
    atom_idx, aatype = atom_idx[:n], aatype[:n]
    xyz, bfac = xyz[:n], bfac[:n]

    def unpack_chain(cid: int) -> str:
        chars = []
        while cid:
            chars.append(chr(cid & 0xFF))
            cid >>= 8
        return "".join(reversed(chars)) or "A"

    for cid in np.unique(chain_ids):
        sel = chain_ids == cid
        # res_seq is auth_seq*64 + icode_rank (see mmcif_atoms.cc):
        # insertion-coded residues stay distinct and (seq, icode)-ordered;
        # residue_index decodes back to the auth number (duplicated across
        # insertions, like the reference's `parsers.py:53` res.id[1]).
        seqs = res_seq[sel]
        uniq_seqs, inverse = np.unique(seqs, return_inverse=True)
        n_res = len(uniq_seqs)
        pos = np.zeros((n_res, 37, 3), np.float32)
        mask = np.zeros((n_res, 37), np.float32)
        b = np.zeros((n_res, 37), np.float32)
        aat = np.full(n_res, 20, np.int8)
        # First occurrence wins per (residue, atom) slot.
        keys = inverse.astype(np.int64) * 64 + atom_idx[sel].astype(np.int64)
        _, first = np.unique(keys, return_index=True)
        rows = inverse[first]
        slots = atom_idx[sel][first]
        pos[rows, slots] = xyz[sel][first]
        mask[rows, slots] = 1.0
        b[rows, slots] = bfac[sel][first]
        # Residue aatype from the first atom seen for that residue.
        _, res_first = np.unique(inverse, return_index=True)
        aat[inverse[res_first]] = aatype[sel][res_first]
        chains[unpack_chain(int(cid))] = {
            "aatype": aat.astype(np.int32),
            "atom_positions": pos,
            "atom_mask": mask,
            "b_factors": b,
            "residue_index": np.floor_divide(uniq_seqs, 64).astype(np.int32),
        }
    return chains, (start, end)
