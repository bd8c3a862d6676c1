"""J-Q model: Heisenberg + 4-site plaquette singlet-projector term.

Counterpart of reference models/jq.py:16-309 (``JQ``):
H = j1 sum_<ij> S_i.S_j - q sum_p (S_i.S_j - 1/4)(S_k.S_l - 1/4) + h.c. plaquette pairs.
"""

from __future__ import annotations

from math import sqrt

import jax.numpy as jnp

from ..ctm.c4v import rdm as rdm_c4v
from ..ctm.generic import rdm as rdm_gen
from ..groups import su2


def _cast_to_real(t):
    return t.real if jnp.iscomplexobj(t) else t


def _embed(op2, idx, n, eye):
    """Embed the two-site operator ``op2[b1,b2,k1,k2]`` (qubit pair) at
    positions ``idx=(i,j)`` of an ``n``-qubit register; returns the
    ``2^n x 2^n`` matrix.  Disjoint-support products then compose by
    plain matrix multiplication."""
    bra = [chr(ord("a") + i) for i in range(n)]
    ket = [chr(ord("A") + i) for i in range(n)]
    i, j = idx
    sub_op = bra[i] + bra[j] + ket[i] + ket[j]
    sub_ids = [bra[k] + ket[k] for k in range(n) if k not in idx]
    out = "".join(bra) + "".join(ket)
    t = jnp.einsum(",".join([sub_op] + sub_ids) + "->" + out, op2,
                   *([eye] * len(sub_ids)))
    return t.reshape(2**n, 2**n)


class JQ:
    def __init__(self, j1=0.0, q=1.0, dtype=jnp.float64):
        self.dtype = dtype
        self.phys_dim = 2
        self.j1 = j1
        self.q = q
        s2 = su2.SU2(self.phys_dim, dtype=dtype)
        id2 = jnp.eye(4, dtype=dtype).reshape(2, 2, 2, 2)
        SS = s2.SS()
        SSp = SS - 0.25 * id2
        SSpSSp = jnp.einsum("ijab,klcd->ijklabcd", SSp, SSp)
        SSpSSp = SSpSSp + SSpSSp.transpose(0, 2, 1, 3, 4, 6, 5, 7)
        h2x2_SS = jnp.einsum("ijab,klcd->ijklabcd", SS, id2)
        # (reference jq.py:58-73)
        self.h2 = SS
        self.h4 = SSpSSp
        self.hp_h_q = j1 * (h2x2_SS + h2x2_SS.transpose(2, 3, 0, 1, 6, 7, 4, 5)) - q * SSpSSp
        self.hp_v_q = (
            j1 * (
                h2x2_SS.transpose(0, 2, 1, 3, 4, 6, 5, 7)
                + h2x2_SS.transpose(2, 0, 3, 1, 6, 4, 7, 5)
            )
            - q * SSpSSp
        )
        self.obs_ops = {"sz": s2.SZ(), "sp": s2.SP(), "sm": s2.SM()}

    def energy_2x2_4site(self, state, env):
        """Alternating horizontal/vertical plaquette operators over the
        2x2 cell (reference jq.py:83-140)."""
        sites, site_of = state.sites, state.vertexToSite
        C, T = env.C, env.T
        e = jnp.einsum(
            "ijklabcd,ijklabcd", rdm_gen.rdm2x2((0, 0), sites, site_of, C, T), self.hp_h_q
        )
        e += jnp.einsum(
            "ijklabcd,ijklabcd", rdm_gen.rdm2x2((1, 0), sites, site_of, C, T), self.hp_v_q
        )
        e += jnp.einsum(
            "ijklabcd,ijklabcd", rdm_gen.rdm2x2((0, 1), sites, site_of, C, T), self.hp_v_q
        )
        e += jnp.einsum(
            "ijklabcd,ijklabcd", rdm_gen.rdm2x2((1, 1), sites, site_of, C, T), self.hp_h_q
        )
        return _cast_to_real(e / 4.0)

    def eval_obs(self, state, env):
        sites, site_of = state.sites, state.vertexToSite
        obs = {"avg_m": 0.0}
        for coord in sites:
            rho = rdm_gen.rdm1x1(coord, sites, site_of, env.C, env.T)
            for label, op in self.obs_ops.items():
                obs[f"{label}{coord}"] = complex(jnp.trace(rho @ op))
            obs[f"m{coord}"] = sqrt(
                abs(obs[f"sz{coord}"] ** 2 + obs[f"sp{coord}"] * obs[f"sm{coord}"])
            )
            obs["avg_m"] += obs[f"m{coord}"]
        obs["avg_m"] /= len(sites)
        for coord in sites:
            r21 = rdm_gen.rdm2x1(coord, sites, site_of, env.C, env.T)
            r12 = rdm_gen.rdm1x2(coord, sites, site_of, env.C, env.T)
            obs[f"SS2x1{coord}"] = complex(jnp.einsum("ijab,ijab", r21, self.h2)).real
            obs[f"SS1x2{coord}"] = complex(jnp.einsum("ijab,ijab", r12, self.h2)).real
        labels = (
            ["avg_m"]
            + [f"m{c}" for c in sites]
            + [f"SS2x1{c}" for c in sites]
            + [f"SS1x2{c}" for c in sites]
        )
        return [obs[l] for l in labels], labels

class JQ_C4V:
    """One-site C4v J-Q (reference models/jq.py:310-463): due to C4v
    symmetry a single 2x2 plaquette RDM carries the whole energy,
    e = <hp> with hp folding two NN bonds and the two ring pairings."""

    def __init__(self, j1=0.0, q=1.0, dtype=jnp.float64, rotated=False):
        self.dtype = dtype
        self.phys_dim = 2
        self.j1 = j1
        self.q = q
        s2 = su2.SU2(self.phys_dim, dtype=dtype)
        id2 = jnp.eye(4, dtype=dtype).reshape(2, 2, 2, 2)
        SS = s2.SS()
        if rotated:
            # bipartite pattern absorbed into B = R A (reference
            # jq.py:464-692, ``JQ_C4V_BIPARTITE``)
            rot = s2.BP_rot()
            SS = jnp.einsum("ki,kjcb,ca->ijab", rot, SS, rot)
        SSp = SS - 0.25 * id2
        ring = jnp.einsum("ijab,klcd->ijklabcd", SSp, SSp)
        ring = ring + ring.transpose(0, 2, 1, 3, 4, 6, 5, 7)
        nn = jnp.einsum("ijab,klcd->ijklabcd", SS, id2)
        self.h2 = SS
        self.h4 = ring
        self.hp = j1 * (nn + nn.transpose(0, 2, 1, 3, 4, 6, 5, 7)) - q * ring
        self.obs_ops = {"sz": s2.SZ(), "sp": s2.SP(), "sm": s2.SM()}

    def energy_1x1(self, a, env):
        rho = rdm_c4v.rdm2x2(a, env)
        return _cast_to_real(jnp.einsum("ijklabcd,ijklabcd", rho, self.hp))

    def eval_obs(self, a, env):
        obs = {}
        rho1 = rdm_c4v.rdm1x1(a, env)
        for label, op in self.obs_ops.items():
            obs[label] = complex(jnp.trace(rho1 @ op)).real
        obs["m"] = sqrt(abs(obs["sz"] ** 2 + obs["sp"] * obs["sm"]))
        rho2 = rdm_c4v.rdm2x1(a, env)
        obs["SS2x1"] = complex(jnp.einsum("ijab,ijab", rho2, self.h2)).real
        labels = ["m", "sz", "sp", "sm", "SS2x1"]
        return [obs[l] for l in labels], labels


class JQ_C4V_BIPARTITE(JQ_C4V):
    """C4v J-Q with the antiferromagnetic sublattice rotation folded
    into the Hamiltonian (reference models/jq.py:464-692)."""

    def __init__(self, j1=0.0, q=1.0, dtype=jnp.float64):
        super().__init__(j1=j1, q=q, dtype=dtype, rotated=True)


class JQ_C4V_PLAQUETTE:
    """J-Q for a plaquette-merged one-site C4v iPEPS: each tensor hosts
    four spins (s0 s1 / s2 s3, phys_dim 2^4), so H splits into an
    on-site term h1 (intra-plaquette bonds + ring) and a NN term h2
    that folds the horizontal and vertical inter-plaquette couplings
    (reference models/jq.py:693-905).  ``q`` weights the intra- and
    ``q_inter`` the inter-plaquette ring exchange."""

    def __init__(self, j1=0.0, q=1.0, q_inter=1.0, dtype=jnp.float64):
        self.dtype = dtype
        self.phys_dim = 16
        self.j1 = j1
        self.q = q
        self.q_inter = q_inter
        s2 = su2.SU2(2, dtype=dtype)
        eye = jnp.eye(2, dtype=dtype)
        id2 = jnp.eye(4, dtype=dtype).reshape(2, 2, 2, 2)
        SS = s2.SS()
        SSp = SS - 0.25 * id2
        self.SS = SS

        E4 = lambda op, i, j: _embed(op, (i, j), 4, eye)
        # intra-plaquette: four bonds + the two ring pairings {01,23},{02,13}
        self.h1 = self.j1 * (
            E4(SS, 0, 1) + E4(SS, 2, 3) + E4(SS, 0, 2) + E4(SS, 1, 3)
        ) - self.q * (
            E4(SSp, 0, 1) @ E4(SSp, 2, 3) + E4(SSp, 0, 2) @ E4(SSp, 1, 3)
        )

        # inter-plaquette: i = qubits 0..3, j (right neighbour) = 4..7.
        # Horizontal bonds s1_i-s0_j, s3_i-s2_j and ring {(1,4)(3,6)},
        # {(1,3)(4,6)}; the vertical term is its image under the diagonal
        # reflection (s1 <-> s2 inside each plaquette), folded onto the
        # same horizontal rdm2x1 by C4v symmetry.
        E8 = lambda op, i, j: _embed(op, (i, j), 8, eye)
        h2_h = self.j1 * (E8(SS, 1, 4) + E8(SS, 3, 6)) - self.q_inter * (
            E8(SSp, 1, 4) @ E8(SSp, 3, 6) + E8(SSp, 1, 3) @ E8(SSp, 4, 6)
        )
        h2_v = self.j1 * (E8(SS, 2, 4) + E8(SS, 3, 5)) - self.q_inter * (
            E8(SSp, 2, 4) @ E8(SSp, 3, 5) + E8(SSp, 2, 3) @ E8(SSp, 4, 5)
        )
        self.h2 = (h2_h + h2_v).reshape(16, 16, 16, 16)
        self.obs_ops = {"sz": s2.SZ(), "sp": s2.SP(), "sm": s2.SM()}

    def energy_1x1(self, a, env):
        """e = (<h1>_rho1x1 + <h2>_rho2x1)/4 per original-lattice site
        (reference jq.py:824-850)."""
        rho1 = rdm_c4v.rdm1x1(a, env)
        rho2 = rdm_c4v.rdm2x1(a, env)
        e1 = jnp.einsum("ij,ij", rho1, self.h1)
        e2 = jnp.einsum("ijab,ijab", rho2, self.h2)
        return _cast_to_real(e1 + e2) / 4.0

    def eval_obs(self, a, env):
        """Per-subsite magnetizations from the plaquette rdm1x1 viewed
        as a 4-qubit density matrix (reference jq.py:851-905)."""
        obs = {}
        rho = rdm_c4v.rdm1x1(a, env).reshape((2,) * 8)
        for r in range(4):
            bra = [chr(ord("a") + i) for i in range(4)]
            ket = list(bra)
            bra[r], ket[r] = "x", "y"
            expr = "".join(bra) + "".join(ket) + ",xy"
            for label, op in self.obs_ops.items():
                obs[f"{label}{r}"] = complex(jnp.einsum(expr, rho, op)).real
            obs[f"m{r}"] = sqrt(
                abs(obs[f"sz{r}"] ** 2 + obs[f"sp{r}"] * obs[f"sm{r}"])
            )
        labels = [f"m{r}" for r in range(4)] + [
            f"{l}{r}" for r in range(4) for l in ("sz", "sp", "sm")
        ]
        return [obs[l] for l in labels], labels
