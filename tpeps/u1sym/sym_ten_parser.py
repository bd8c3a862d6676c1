"""Parser for classified symmetric-tensor basis files.

Counterpart of reference u1sym/sym_ten_parser.py:1-162: reads the
``D<k>_U1_*.txt`` classification format — a bracketed list of
``(meta_dict, [((s,u,l,d,r), value), ...])`` pairs where the meta dict
uses quasi-Python syntax with unquoted identifiers (``pg: A_1``,
``name: T0``)::

    [
    ({'irreps': (1,1), 'pg': A_1, 'name': T0, ... },
    [
    ((1, 0, 2, 1, 2), 1),
    ...
    ]),
    ...
    ]

tpeps generates bases programmatically (:mod:`tpeps.u1sym.basis`); this
parser exists so user-supplied classification files in the reference's
on-disk format load directly.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def parse_meta(s):
    """Parse the quasi-dict inside {...} into a flat str->str mapping
    (reference sym_ten_parser.py:4-10)."""
    meta = {}
    for f in s[1:].split(", '"):
        sep = f.find(":")
        if sep < 0:
            continue
        meta[f[: sep - 1]] = f[sep + 1:].strip()
    return meta


def _parse_elem(s):
    end = s.find("),")
    inds = tuple(int(i) for i in s[1:end].split(","))
    val = complex(s[end + 2: -1]) if "j" in s[end + 2: -1] else float(s[end + 2: -1])
    return inds, val


def _parse_elems(s):
    """Split the elements block into top-level (...) groups
    (reference sym_ten_parser.py:19-39)."""
    raw, level, bf = [], 0, ""
    for c in s:
        bf += c
        if c == "(":
            if level == 0:
                bf = ""
            level += 1
        elif c == ")":
            level -= 1
            if level == 0:
                raw.append(bf)
                bf = ""
    return [_parse_elem(r) for r in raw]


def parse_classification(t):
    """State machine over the whole file: alternating {meta} and
    [elements] blocks inside top-level (...) groups
    (reference sym_ten_parser.py:41-101)."""
    meta_t, raw_t = [], []
    level = meta = elem = 0
    bf = ""
    for c in t:
        if level == 0 and c == "(":
            level = 1
            continue
        if level == 1 and c == "{":
            meta, bf = 1, ""
            continue
        if level * meta == 1:
            if c == "}":
                meta = 0
                meta_t.append(bf)
            else:
                bf += c
            continue
        if level * (1 - meta) * (1 - elem) == 1 and c == "[":
            elem, bf = 1, ""
            continue
        if level * (1 - meta) * elem == 1:
            if c == "]":
                elem = 0
                raw_t.append(bf)
            else:
                bf += c
            continue
        if level == 1 and c == ")":
            level = 0
    metas = [{"meta": parse_meta(mt)} for mt in meta_t]
    elems = [_parse_elems(rt) for rt in raw_t]
    return list(zip(metas, elems))


def parse_symten_file(infile):
    with open(infile) as f:
        return parse_classification(f.read().replace("\n", ""))


def import_sym_tensors(p, D, pg, infile, dtype=jnp.float64):
    """Load all basis tensors of point group ``pg`` from a
    classification file as ``[(meta, jnp.ndarray[p,D,D,D,D])]``
    (reference sym_ten_parser.py:148-162)."""
    tensors = []
    for meta, elems in parse_symten_file(infile):
        if meta["meta"].get("pg") != pg:
            continue
        t = np.zeros((p, D, D, D, D))
        for inds, val in elems:
            t[inds] = val
        tensors.append((meta, jnp.asarray(t, dtype=dtype)))
    return tensors
