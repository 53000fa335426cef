"""Lean mmCIF parser for protein chains (host-side, numpy).

Dependency-free replacement for the reference's Biopython-based
`data/mmcif_parsing.py` + `data/parsers.py` path: parses the `_atom_site`
loop into per-chain atom37 arrays plus the header fields the dataset
filters need (resolution, oligomeric details). Handles the mmCIF quoting
rules that matter for coordinate files: loop_ tables, '...'/"..." quoted
tokens, `;`-delimited multi-line values, and `#` comments.
"""
from __future__ import annotations

import dataclasses
import gzip
import re
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from se3_diffusion_tpu.proteins import residue_constants as rc

_TOKEN_RE = re.compile(r"'(?:[^']|'(?=\S))*'|\"(?:[^\"]|\"(?=\S))*\"|\S+")


@dataclasses.dataclass
class ParsedChain:
    chain_id: str
    aatype: np.ndarray  # [N]
    atom_positions: np.ndarray  # [N, 37, 3]
    atom_mask: np.ndarray  # [N, 37]
    b_factors: np.ndarray  # [N, 37]
    residue_index: np.ndarray  # [N]


@dataclasses.dataclass
class ParsedMmcif:
    entry_id: str
    resolution: Optional[float]
    oligomeric_details: List[str]
    oligomeric_count: List[str]
    chains: Dict[str, ParsedChain]
    raw_fields: Dict[str, List[str]]


def _tokenize(line: str) -> List[str]:
    toks = _TOKEN_RE.findall(line)
    out = []
    for t in toks:
        if t and t[0] in "'\"" and t[-1] == t[0] and len(t) > 1:
            t = t[1:-1]
        out.append(t)
    return out


def _iter_records(text: str) -> Iterator[Tuple[str, List[str]]]:
    """Yields ('item', [name, value]) or ('loop', [headers, rows...]).

    Minimal-but-correct mmCIF record iteration; `;` blocks are collapsed
    into single tokens.
    """
    lines = text.splitlines()
    i, n = 0, len(lines)

    def read_semicolon_block(start: int) -> Tuple[str, int]:
        buf = []
        j = start + 1
        while j < n and not lines[j].startswith(";"):
            buf.append(lines[j])
            j += 1
        return "\n".join(buf), j + 1

    while i < n:
        line = lines[i].strip()
        if not line or line.startswith("#"):
            i += 1
            continue
        if line.lower().startswith("data_") or line.lower() == "global_":
            i += 1
            continue
        if line.lower() == "loop_":
            headers = []
            i += 1
            while i < n and lines[i].strip().startswith("_"):
                headers.append(lines[i].strip().split()[0])
                i += 1
            rows: List[List[str]] = []
            pending: List[str] = []
            while i < n:
                raw = lines[i]
                s = raw.strip()
                if (
                    not s
                    or s.startswith("_")
                    or s.lower() in ("loop_",)
                    or s.startswith("#")
                    or s.lower().startswith("data_")
                ):
                    break
                if raw.startswith(";"):
                    val, i = read_semicolon_block(i)
                    pending.append(val)
                else:
                    pending.extend(_tokenize(s))
                    i += 1
                while len(pending) >= len(headers):
                    rows.append(pending[: len(headers)])
                    pending = pending[len(headers):]
            yield "loop", [headers, rows]
            continue
        if line.startswith("_"):
            toks = _tokenize(line)
            name = toks[0]
            if len(toks) > 1:
                yield "item", [name, " ".join(toks[1:])]
                i += 1
            else:
                # Value on following line(s).
                i += 1
                if i < n and lines[i].startswith(";"):
                    val, i = read_semicolon_block(i)
                else:
                    val = lines[i].strip() if i < n else ""
                    i += 1
                yield "item", [name, val]
            continue
        i += 1


def parse_mmcif_string(text: str, use_native: bool = True) -> ParsedMmcif:
    items: Dict[str, List[str]] = {}
    atom_site: Optional[Tuple[List[str], List[List[str]]]] = None

    native_chains = None
    if use_native:
        try:
            from se3_diffusion_tpu.data import mmcif_native

            fast = mmcif_native.parse_atoms_fast(text)
        except Exception:
            fast = None
        if fast is not None:
            native_chains, (start, end) = fast
            # Headers still parse in Python; cut the (large) atom rows out.
            text = text[:start] + text[end:]

    for kind, payload in _iter_records(text):
        if kind == "item":
            items.setdefault(payload[0], []).append(payload[1])
        else:
            headers, rows = payload
            if headers and headers[0].startswith("_atom_site."):
                atom_site = (headers, rows)
            else:
                for ci, h in enumerate(headers):
                    items.setdefault(h, []).extend(r[ci] for r in rows)

    def get_float(*names) -> Optional[float]:
        for nm in names:
            for v in items.get(nm, []):
                try:
                    return float(v)
                except (TypeError, ValueError):
                    continue
        return None

    resolution = get_float(
        "_refine.ls_d_res_high",
        "_em_3d_reconstruction.resolution",
        "_reflns.d_resolution_high",
    )
    entry_id = (items.get("_entry.id") or ["unknown"])[0]

    chains: Dict[str, Dict[int, dict]] = {}
    if native_chains is not None:
        return ParsedMmcif(
            entry_id=entry_id,
            resolution=resolution,
            oligomeric_details=[
                v.lower()
                for v in items.get("_pdbx_struct_assembly.oligomeric_details", [])
            ],
            oligomeric_count=items.get("_pdbx_struct_assembly.oligomeric_count", []),
            chains={
                cid: ParsedChain(chain_id=cid, **fields)
                for cid, fields in native_chains.items()
            },
            raw_fields={},
        )

    if atom_site is not None:
        headers, rows = atom_site
        col = {h.split(".", 1)[1]: i for i, h in enumerate(headers)}

        def get(row, name, default="?"):
            idx = col.get(name)
            return row[idx] if idx is not None else default

        for row in rows:
            if get(row, "group_PDB", "ATOM") != "ATOM":
                continue
            model = get(row, "pdbx_PDB_model_num", "1")
            if model not in ("1", ".", "?"):
                continue
            alt = get(row, "label_alt_id", ".")
            if alt not in (".", "A", "?"):
                continue
            atom_name = get(row, "auth_atom_id", "?")
            if atom_name == "?":
                atom_name = get(row, "label_atom_id")
            res_name = get(row, "auth_comp_id", "?")
            if res_name == "?":
                res_name = get(row, "label_comp_id")
            if atom_name not in rc.ATOM_ORDER:
                continue
            chain_id = get(row, "auth_asym_id", "?")
            if chain_id == "?":
                chain_id = get(row, "label_asym_id", "A")
            try:
                seq = int(get(row, "auth_seq_id", get(row, "label_seq_id")))
            except ValueError:
                continue
            # Insertion codes: residues sharing auth_seq_id but carrying
            # distinct pdbx_PDB_ins_code are SEPARATE residues (antibody
            # chothia numbering etc.). Biopython keys residues by
            # (resseq, icode) and the reference keeps them
            # (`/root/reference/data/parsers.py:19-21` explicitly allows
            # insertions); keying by seq alone would merge their atoms.
            icode = get(row, "pdbx_PDB_ins_code", ".")
            if icode in (".", "?", ""):
                icode = ""
            x = float(get(row, "Cartn_x"))
            y = float(get(row, "Cartn_y"))
            z = float(get(row, "Cartn_z"))
            try:
                b = float(get(row, "B_iso_or_equiv", "0"))
            except ValueError:
                b = 0.0
            res = chains.setdefault(chain_id, {}).setdefault(
                (seq, icode),
                {
                    "name": res_name,
                    "pos": np.zeros((rc.ATOM_TYPE_NUM, 3), np.float32),
                    "mask": np.zeros(rc.ATOM_TYPE_NUM, np.float32),
                    "b": np.zeros(rc.ATOM_TYPE_NUM, np.float32),
                },
            )
            a = rc.ATOM_ORDER[atom_name]
            if res["mask"][a] == 0:
                res["pos"][a] = (x, y, z)
                res["mask"][a] = 1.0
                res["b"][a] = b

    parsed_chains = {}
    for chain_id, residues in chains.items():
        # (seq, icode) sort puts the base residue ('' icode) before its
        # insertions (100 < 100A < 100B < 101) — PDB convention, and the
        # order Biopython hands the reference.
        seqs = sorted(residues)
        aatype, pos, mask, bfac, ridx = [], [], [], [], []
        for s in seqs:
            r = residues[s]
            s = s[0]  # residue_index = auth_seq_id, duplicated across
            # insertion-coded residues (reference `parsers.py:53` uses
            # res.id[1] the same way).
            one = rc.RESTYPE_3TO1.get(r["name"], "X")
            # Selenomethionine maps to MET; anything unknown to UNK (20).
            aa = (
                rc.RESTYPE_ORDER["M"]
                if r["name"] == "MSE"
                else rc.RESTYPE_ORDER.get(one, rc.RESTYPE_NUM)
            )
            aatype.append(aa)
            pos.append(r["pos"])
            mask.append(r["mask"])
            bfac.append(r["b"])
            ridx.append(s)
        parsed_chains[chain_id] = ParsedChain(
            chain_id=chain_id,
            aatype=np.asarray(aatype, np.int32),
            atom_positions=np.stack(pos) if pos else np.zeros((0, 37, 3)),
            atom_mask=np.stack(mask) if mask else np.zeros((0, 37)),
            b_factors=np.stack(bfac) if bfac else np.zeros((0, 37)),
            residue_index=np.asarray(ridx, np.int32),
        )

    return ParsedMmcif(
        entry_id=entry_id,
        resolution=resolution,
        oligomeric_details=[
            v.lower() for v in items.get("_pdbx_struct_assembly.oligomeric_details", [])
        ],
        oligomeric_count=items.get("_pdbx_struct_assembly.oligomeric_count", []),
        chains=parsed_chains,
        raw_fields={},
    )


def parse_mmcif_file(path: str) -> ParsedMmcif:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        return parse_mmcif_string(f.read())
