"""Spin-1/2 J1-J2-J3-lambda model with a chiral 4-site plaquette term.

Counterpart of reference models/j1j2lambda.py:16-334
(``J1J2LAMBDA_C4V_BIPARTITE``):

.. math::
    H = J_1 \\sum_{<ij>} S_i.S_j + J_2 \\sum_{<<ij>>} S_i.S_j
      + J_3 \\sum_{<<<ij>>>} S_i.S_j
      + i\\lambda \\sum_p (P_p - P_p^{-1})

where P_p cyclically permutes the four spins of a plaquette clockwise.
Requires complex dtype.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ctm.c4v import rdm as rdm_c4v
from ..ctm.c4v.env import EnvC4v
from ..groups import su2
from .j1j2 import J1J2_C4V_BIPARTITE, _cast_to_real


def _chiral_plaquette_term(dtype):
    """i(P4 - P4^{-1}) on a 2x2 plaquette in the s0 s1 / s2 s3 physical
    order of the 2x2 RDMs (reference j1j2lambda.py:99-121)."""
    # pairwise swap on the first two of four spin-1/2 sites
    P12 = jnp.asarray(
        [[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=dtype
    ).reshape(2, 2, 2, 2)
    id2 = jnp.eye(4, dtype=dtype).reshape(2, 2, 2, 2)

    P12II = jnp.einsum("abij,cdkl->abcdijkl", P12, id2)
    PI12I = P12II.transpose(3, 0, 1, 2, 7, 4, 5, 6)
    PII12 = P12II.transpose(2, 3, 0, 1, 6, 7, 4, 5)
    # cyclic permutation built from transpositions, applied right-to-left
    P4 = jnp.tensordot(PI12I, P12II, ((4, 5, 6, 7), (0, 1, 2, 3)))
    P4 = jnp.tensordot(PII12, P4, ((4, 5, 6, 7), (0, 1, 2, 3)))
    chiral = 1.0j * (P4 - P4.reshape(16, 16).T.reshape((2,) * 8))
    # ring order s0->s1->s3->s2 -> rdm's row-major s0 s1 / s2 s3 order
    return chiral.transpose(0, 1, 3, 2, 4, 5, 7, 6)


class J1J2LAMBDA_C4V_BIPARTITE(J1J2_C4V_BIPARTITE):
    """C4v bipartite J1-J2-J3-lambda (reference j1j2lambda.py:16)."""

    def __init__(self, j1=1.0, j2=0.0, j3=0.0, hz_stag=0.0, delta_zz=1.0,
                 lmbd=0.0, dtype=jnp.complex128):
        assert jnp.issubdtype(dtype, jnp.complexfloating), \
            "J1-J2-lambda requires complex dtype"
        super().__init__(j1=j1, j2=j2, j3=j3, hz_stag=hz_stag,
                         delta_zz=delta_zz, dtype=dtype)
        self.lmbd = lmbd

        s2 = su2.SU2(self.phys_dim, dtype=dtype)
        rot = s2.BP_rot()

        # NOTE: this model's plaquette term differs from J1J2's: the
        # staggered-field contribution enters as the 4-site product
        # SZ(-SZ)(-SZ)SZ and there is no uniform-field term
        # (reference j1j2lambda.py:89-95) — override hp_rot accordingly.
        id2 = s2.I_N(N=2)
        h2x2_SS_dzz = jnp.einsum("ijab,klcd->ijklabcd", self.SS_delta_zz, id2)
        h2x2_SS = jnp.einsum("ijab,klcd->ijklabcd", self.SS, id2)
        perm = lambda t, p: t.transpose(p)
        hp = 0.5 * j1 * (
            h2x2_SS_dzz
            + perm(h2x2_SS_dzz, (0, 2, 1, 3, 4, 6, 5, 7))
            + perm(h2x2_SS_dzz, (2, 3, 0, 1, 6, 7, 4, 5))
            + perm(h2x2_SS_dzz, (3, 1, 2, 0, 7, 5, 6, 4))
        ) + j2 * (
            perm(h2x2_SS, (0, 3, 2, 1, 4, 7, 6, 5))
            + perm(h2x2_SS, (2, 1, 0, 3, 6, 5, 4, 7))
        ) - 0.25 * hz_stag * jnp.einsum(
            "ia,jb,kc,ld->ijklabcd", s2.SZ(), -s2.SZ(), -s2.SZ(), s2.SZ()
        )
        self.hp_rot = jnp.einsum(
            "xj,yk,ixylauvd,ub,vc->ijklabcd", rot, rot, hp, rot, rot
        )
        chiral = _chiral_plaquette_term(dtype)
        self.chiral_rot = jnp.einsum(
            "xj,yk,ixylauvd,ub,vc->ijklabcd", rot, rot, chiral, rot, rot
        )
        self.hp_chiral_rot = lmbd * self.chiral_rot

    def energy_1x1(self, a, env: EnvC4v):
        """E/site from the full 2x2 RDM (+ rdm3x1 for J3)
        (reference j1j2lambda.py:132-155)."""
        rho2x2 = rdm_c4v.rdm2x2(a, env)
        e = jnp.einsum("ijklabcd,ijklabcd", rho2x2,
                       self.hp_rot + self.hp_chiral_rot)
        if abs(self.j3) > 0:
            rho3x1 = rdm_c4v.rdm3x1(a, env, sym_pos_def=True)
            e = e + 2 * self.j3 * jnp.einsum("ijab,ijab", rho3x1, self.SS)
        return _cast_to_real(e)

    def eval_obs(self, a, env: EnvC4v):
        """Magnetization, spin components, SS2x1 (+SS3x1, ChiralT)
        (reference j1j2lambda.py:157-225)."""
        obs = {}
        if abs(self.j3) > 0:
            rho3x1 = rdm_c4v.rdm3x1(a, env)
            obs["SS3x1"] = _cast_to_real(
                jnp.einsum("ijab,ijab", rho3x1, self.SS))
        if abs(self.lmbd) > 0:
            rho2x2 = rdm_c4v.rdm2x2(a, env)
            obs["ChiralT"] = _cast_to_real(
                jnp.einsum("ijklabcd,ijklabcd", rho2x2, self.chiral_rot))
        rho2x1 = rdm_c4v.rdm2x1_sl(a, env)
        obs["SS2x1"] = _cast_to_real(
            jnp.einsum("ijab,ijab", rho2x1, self.SS_rot))
        rho1x1 = jnp.einsum("ijaj->ia", rho2x1)
        rho1x1 = rho1x1 / jnp.trace(rho1x1)
        for label, op in self.obs_ops.items():
            obs[label] = jnp.trace(rho1x1 @ op)
        obs["m"] = jnp.sqrt(jnp.abs(obs["sz"] ** 2 + obs["sp"] * obs["sm"]))
        labels = ["m"] + list(self.obs_ops.keys()) + ["SS2x1"]
        if abs(self.j3) > 0:
            labels += ["SS3x1"]
        if abs(self.lmbd) > 0:
            labels += ["ChiralT"]
        return [obs[l] for l in labels], labels
