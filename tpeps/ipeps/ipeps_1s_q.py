"""Single-site iPEPS with an in-plane spiral wave-vector q.

Counterpart of reference ipeps/ipeps_1s_Q.py:18-240 (``IPEPS_1S_Q``):
the lattice is tiled by ``u(r) A`` with ``u(r) = exp(-i 2 pi q . r)``
acting on the physical index.  Because u is unitary on the physical
leg, the double-layer tensor (and hence the CTM environment) is
site-independent — CTMRG runs on the bare single site and the spiral
enters only through rotated operator insertions in the RDMs
(see models/spin_triangular.py energy/observable evaluators).
"""

from __future__ import annotations

from math import pi

import jax
import jax.numpy as jnp
import numpy as np

from ..groups import su2
from .ipeps import IPEPS, read_ipeps, write_ipeps


class IPEPS_1S_Q(IPEPS):
    """(reference ipeps_1s_Q.py:18)."""

    def __init__(self, sites=None, q=(0, 0), vertexToSite=None):
        if sites:
            assert len(sites) == 1, "IPEPS_1S_Q expects a single site"
        self.q = jnp.asarray(q, dtype=jnp.float64)
        super().__init__(sites, vertexToSite=vertexToSite, lX=1, lY=1)

    def get_parameters(self):
        """Site tensor + wave-vector are variational
        (reference ipeps_1s_Q.py:65-72)."""
        p = dict(self.sites)
        p["q"] = self.q
        return p

    def set_parameters(self, params):
        new = IPEPS_1S_Q(
            {c: params[c] for c in self.sites}, q=params.get("q", self.q),
            vertexToSite=self.vertexToSite,
        )
        return new


def gen_3site(state, q=-1.0 / 3):
    """Unroll a 1S_Q state into an explicit 3-site 120-degree cell
    (reference ipeps_1s_Q.py:156-163)."""
    d = state.site((0, 0)).shape[0]
    s2 = su2.SU2(d, dtype=state.site((0, 0)).dtype)
    R = jax.scipy.linalg.expm((pi * q) * (s2.SP() - s2.SM()))
    a = state.site((0, 0))
    sites = {
        (0, 0): a,
        (1, 0): jnp.einsum("sp,puldr->suldr", R, a),
        (2, 0): jnp.einsum("ps,puldr->suldr", R, a),
    }
    return IPEPS(sites, vertexToSite=lambda c: ((c[0] % 3 - c[1]) % 3, 0), lX=3, lY=3)


def read_ipeps_1s_q(jsonfile, q=(0, 0), aux_seq=(0, 1, 2, 3)):
    """(reference ipeps_1s_Q.py:165-181): q is read from the state file
    when present."""
    import json

    from ..io.tensor_io import read_json_tensor

    with open(jsonfile) as j:
        raw = json.load(j)
    if "q" in raw:
        q = jnp.asarray(np.asarray(read_json_tensor(raw["q"])).real)
    base = read_ipeps(jsonfile, aux_seq=aux_seq)
    return IPEPS_1S_Q(sites=base.sites, q=q)


def write_ipeps_1s_q(state, outputfile, aux_seq=(0, 1, 2, 3), tol=1.0e-14,
                     normalize=False):
    """(reference ipeps_1s_Q.py:184-220)."""
    import json

    from ..io.tensor_io import serialize_bare_tensor_legacy

    write_ipeps(state, outputfile, aux_seq=aux_seq, tol=tol, normalize=normalize)
    with open(outputfile) as f:
        raw = json.load(f)
    raw["q"] = serialize_bare_tensor_legacy(np.asarray(state.q))
    with open(outputfile, "w") as f:
        json.dump(raw, f, indent=4, separators=(",", ": "))
