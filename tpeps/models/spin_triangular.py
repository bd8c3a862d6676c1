"""Triangular-lattice J1-J2-J4-Jchi spin model on the square-lattice mapping.

Counterpart of reference models/spin_triangular.py:265-1070
(``J1J2J4_1SITEQ``, ``J1J2J4``, ``J1J2J4_1SITE``): the triangular
lattice is the square lattice plus one diagonal; ring-exchange (J4) and
chirality terms are evaluated from 2x3/3x2/2x2 patch RDMs
(:mod:`tpeps.ctm.generic.rdm_patch`).  Spiral order is encoded by a
rotation ``R = exp(pi q (S+ - S-))`` applied per sublattice site.
"""

from __future__ import annotations

from math import pi

import jax.numpy as jnp
import jax.scipy.linalg

from ..ctm.generic import rdm as rdm_gen
from ..ctm.generic.rdm_patch import rdm2x2_open, rdm2x3_open1234, rdm3x2_open1234
from ..groups import su2


def _cast_to_real(t):
    return t.real if jnp.iscomplexobj(t) else t


class J1J2J4_1SITEQ:
    """Base: Hamiltonian terms + spiral rotation
    (reference spin_triangular.py:377-505)."""

    def __init__(self, phys_dim=2, j1=1.0, j2=0.0, j4=0.0, jchi=0.0, diag=1.0,
                 q=None, dtype=jnp.float64):
        self.dtype = dtype
        self.phys_dim = phys_dim
        self.j1, self.j2, self.j4, self.jchi = j1, j2, j4, jchi
        self.diag = diag
        self.q = q

        s2 = su2.SU2(phys_dim, dtype=dtype)
        id2 = jnp.eye(phys_dim**2, dtype=dtype).reshape([phys_dim] * 4)
        SS = s2.SS()
        SSId = jnp.einsum("ijab,klcd->ijklabcd", SS, id2)
        SSSS = jnp.einsum("ijab,klcd->ijklabcd", SS, SS)
        # plaquette ring exchange (01)(23) + (il)(jk) - (ik)(jl)
        # (reference spin_triangular.py:465-476)
        h_p = (
            SSSS
            + SSSS.transpose(0, 3, 2, 1, 4, 7, 6, 5)
            - SSSS.transpose(0, 2, 1, 3, 4, 6, 5, 7)
        )
        h_nn_only = (
            SSId
            + SSId.transpose(0, 3, 2, 1, 4, 7, 6, 5)
            + SSId.transpose(2, 3, 0, 1, 6, 7, 4, 5)
            + SSId.transpose(2, 0, 1, 3, 6, 4, 5, 7)
        )
        if jchi != 0:
            assert jnp.issubdtype(dtype, jnp.complexfloating), "jchi requires complex dtype"
        import numpy as np

        Svec = s2.S()
        eps3 = np.zeros((3, 3, 3))
        eps3[0, 1, 2] = eps3[1, 2, 0] = eps3[2, 0, 1] = 1.0
        eps3[0, 2, 1] = eps3[2, 1, 0] = eps3[1, 0, 2] = -1.0
        h_chi = jnp.einsum("abc,bij,ckl,amn->ikmjln", jnp.asarray(eps3, dtype=dtype), Svec, Svec, Svec)

        self.SS, self.SSSS = SS, SSSS
        self.h_p, self.h_nn_only, self.h_chi = h_p, h_nn_only, h_chi
        self.obs_ops = {"sz": s2.SZ(), "sp": s2.SP(), "sm": s2.SM()}

        if q is not None:
            self.R = jax.scipy.linalg.expm((pi * q[0]) * (s2.SP() - s2.SM()))
            self.Rinv = self.R.conj().T
        else:
            self.R = self.Rinv = None

    # ------------------------------------------------------------------
    def _eval_patches_per_site(self, coord, state, env, R, Rinv):
        """nn, nnn, chi, p contributions at ``coord`` from the 2x3, 3x2
        and 2x2 patch RDMs (reference spin_triangular.py:265-345
        ``eval_j1j2j4jX_per_site_legacy``)."""
        sites, site_of = state.sites, state.vertexToSite
        C, T = env.C, env.T
        op_nn, op_nnn, op_chi, op_p = self.h_nn_only, self.SS, self.h_chi, self.h_p
        R3 = R @ R @ R
        R2 = R @ R

        e_nn = e_nnn = e_chi = e_p = 0.0

        # 2x3 patch, opens (sorted row-major 1,2,3,4) -> legacy order
        # "x s3 s2 / s0 s1 x" via permute (2,3,1,0) (reference :283-295)
        r23 = rdm2x3_open1234(coord, sites, site_of, C, T)
        r23 = r23.transpose(2, 3, 1, 0, 6, 7, 5, 4)
        r23 = jnp.einsum(
            r23, [0, 10, 12, 14, 1, 11, 13, 15],
            R, [2, 10], R, [3, 11], R3, [4, 12], R3, [5, 13],
            R2, [6, 14], R2, [7, 15], [0, 2, 4, 6, 1, 3, 5, 7],
        )
        e_nn += jnp.einsum("ijklabcd,abcdijkl", r23, op_nn)
        e_nnn += jnp.einsum("ibkdabcd,acik", r23, op_nnn)
        e_p += jnp.einsum("ijklabcd,abcdijkl", r23, op_p)
        e_chi += jnp.einsum("ijclabcd,abdijl", r23, op_chi)
        e_chi += jnp.einsum("ajklabcd,bcdjkl", r23, op_chi)

        # 3x2 patch (reference :304-331), permute (1,3,2,0)
        r32 = rdm3x2_open1234(coord, sites, site_of, C, T)
        r32 = r32.transpose(1, 3, 2, 0, 5, 7, 6, 4)
        r32 = jnp.einsum(
            r32, [0, 10, 12, 14, 1, 11, 13, 15],
            R2, [2, 10], R2, [3, 11], R3, [4, 12], R3, [5, 13],
            R, [6, 14], R, [7, 15], [0, 2, 4, 6, 1, 3, 5, 7],
        )
        e_nn += jnp.einsum("ijklabcd,abcdijkl", r32, op_nn)
        e_nnn += jnp.einsum("ibkdabcd,acik", r32, op_nnn)
        e_p += jnp.einsum("ijklabcd,abcdijkl", r32, op_p)
        e_chi += jnp.einsum("ijclabcd,abdijl", r32, op_chi)
        e_chi += jnp.einsum("ajklabcd,bcdjkl", r32, op_chi)

        # 2x2 patch (reference :332-345), permute (0,1,3,2)
        r22 = rdm_gen.rdm2x2(coord, sites, site_of, C, T)
        r22 = r22.transpose(0, 1, 3, 2, 4, 5, 7, 6)
        r22 = jnp.einsum(
            r22, [0, 10, 4, 12, 1, 11, 5, 13],
            R, [2, 10], R, [3, 11], Rinv, [6, 12], Rinv, [7, 13],
            [0, 2, 4, 6, 1, 3, 5, 7],
        )
        e_nn += jnp.einsum("ijklabcd,abcdijkl", r22, op_nn)
        e_nnn += jnp.einsum("ibkdabcd,acik", r22, op_nnn)
        e_p += jnp.einsum("ijklabcd,abcdijkl", r22, op_p)
        e_chi += jnp.einsum("ijclabcd,adbilj", r22, op_chi)
        e_chi += jnp.einsum("ajklabcd,bdcjlk", r22, op_chi)

        return e_nn / 4, e_nnn, e_chi / 3, e_p

    def _eval_nn_per_site(self, coord, state, env, R, Rinv):
        """NN axis bonds + diagonal bond, with the spiral rotation applied
        to the displaced site's operator (reference spin_triangular.py:14-51
        ``eval_nn_per_site``).  The diagonal bond comes from the 2x2 patch
        with positions (1, 2) open — the anti-diagonal pair."""
        sites, site_of = state.sites, state.vertexToSite
        C, T = env.C, env.T
        R2 = R @ R
        r21 = rdm_gen.rdm2x1(coord, sites, site_of, C, T)
        e_nn = jnp.einsum(
            "ijab,abij", jnp.einsum("ixay,xj,yb->ijab", self.SS, R, R), r21)
        r12 = rdm_gen.rdm1x2(coord, sites, site_of, C, T)
        e_nn += jnp.einsum(
            "ijab,abij", jnp.einsum("ixay,xj,yb->ijab", self.SS, Rinv, Rinv), r12)
        r_d = rdm2x2_open(coord, sites, site_of, C, T, open_sites=(1, 2))
        e_diag = jnp.einsum(
            "ijab,abij", jnp.einsum("xjyb,xi,ya->ijab", self.SS, R2, R2), r_d)
        return e_nn, e_diag

    def _eval_nnn_per_site(self, coord, state, env, R, Rinv):
        """NNN bonds (reference spin_triangular.py:53-115
        ``eval_nnn_per_site_semimanual``): knight-move pairs from the 2x3
        and 3x2 patches (far site rotated by R^3) and the main-diagonal
        pair of the 2x2 patch (rotation omitted, as in the reference)."""
        sites, site_of = state.sites, state.vertexToSite
        C, T = env.C, env.T
        R3 = R @ R @ R
        # rotate ket and bra of the displaced (R^3) site of the pair
        op_rot = jnp.einsum("ixay,xj,yb->ijab", self.SS, R3, jnp.conj(R3))

        e_nnn = 0.0
        # legacy-order patches: [ket_s0..ket_s3, bra_s0..bra_s3] with
        # s0 = bottom-left, s2 = top-right (the knight-move NNN pair)
        r23 = rdm2x3_open1234(coord, sites, site_of, C, T).transpose(
            2, 3, 1, 0, 6, 7, 5, 4)
        rho = jnp.einsum("ibkdabcd->ikac", r23)
        e_nnn += jnp.einsum("ijab,ijab", rho, op_rot)

        r32 = rdm3x2_open1234(coord, sites, site_of, C, T).transpose(
            1, 3, 2, 0, 5, 7, 6, 4)
        rho = jnp.einsum("ibkdabcd->ikac", r32)
        e_nnn += jnp.einsum("ijab,ijab", rho, op_rot)

        # main-diagonal pair of the 2x2 patch; rotation omitted exactly as
        # in the reference (spin_triangular.py:105 "TODO include rotation")
        r22 = rdm_gen.rdm2x2(coord, sites, site_of, C, T)
        rho = jnp.einsum("ixylaxyd->ilad", r22)
        e_nnn += jnp.einsum("ijab,ijab", rho, self.SS)
        return e_nnn

    def energy_per_site(self, state, env, q=None):
        """(reference spin_triangular.py:505-614 ``energy_per_site``):
        with ring exchange / chirality the full patch evaluation is used
        (requires diag == 1); otherwise the cheap bond path with the
        diagonal-anisotropy split ``j1 (e_nn + diag e_nn_diag)``."""
        if q is None:
            q = self.q if self.q is not None else getattr(state, "q", (0, 0))
        s2 = su2.SU2(self.phys_dim, dtype=self.dtype)
        R = jax.scipy.linalg.expm((pi * q[0]) * (s2.SP() - s2.SM()))
        Rinv = R.conj().T

        if abs(self.j4) > 0 or abs(self.jchi) > 0:
            assert self.diag == 1, "diag != 1 unsupported with j4/jchi"
            e_nn = e_nnn = e_chi = e_p = 0.0
            for coord in state.sites:
                nn, nnn, chi, p = self._eval_patches_per_site(coord, state, env, R, Rinv)
                e_nn += nn
                e_nnn += nnn
                e_chi += chi
                e_p += p
            e_cell = (self.j1 * e_nn + self.j2 * e_nnn
                      + self.j4 * e_p + self.jchi * e_chi)
        else:
            e_nn = e_diag = e_nnn = 0.0
            for coord in state.sites:
                nn, dg = self._eval_nn_per_site(coord, state, env, R, Rinv)
                e_nn += nn
                e_diag += dg
                if abs(self.j2) > 0:
                    e_nnn += self._eval_nnn_per_site(coord, state, env, R, Rinv)
            e_cell = self.j1 * (e_nn + self.diag * e_diag) + self.j2 * e_nnn
        return _cast_to_real(e_cell / len(state.sites))

    def eval_obs(self, state, env):
        """Magnetizations + all NN/diagonal bond <S.S>
        (reference spin_triangular.py:1031-1070 pattern)."""
        from math import sqrt

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
            rdiag = rdm_gen.rdm2x2_NNN_11(coord, sites, site_of, env.C, env.T)
            obs[f"SS2x1{coord}"] = complex(jnp.einsum("ijab,ijab", r21, self.SS)).real
            obs[f"SS1x2{coord}"] = complex(jnp.einsum("ijab,ijab", r12, self.SS)).real
            obs[f"SSdiag{coord}"] = complex(jnp.einsum("ijab,ijab", rdiag, self.SS)).real
        labels = (
            ["avg_m"]
            + [f"m{c}" for c in sites]
            + [f"{l}{c}" for c in sites for l in self.obs_ops]
            + [f"SS2x1{c}" for c in sites]
            + [f"SS1x2{c}" for c in sites]
            + [f"SSdiag{c}" for c in sites]
        )
        return [obs[l] for l in labels], labels


class J1J2J4(J1J2J4_1SITEQ):
    """Multi-site unit cells without physical rotation (q=(0,0)),
    reference spin_triangular.py:926-1024."""

    def __init__(self, phys_dim=2, j1=1.0, j2=0.0, j4=0.0, jchi=0.0, diag=1.0,
                 q=(0, 0), dtype=jnp.float64):
        super().__init__(phys_dim=phys_dim, j1=j1, j2=j2, j4=j4, jchi=jchi,
                         diag=diag, q=q, dtype=dtype)


class J1J2J4_1SITE(J1J2J4_1SITEQ):
    """1-site ansatz with 120-degree spiral (q=(-1/3,-1/3)),
    reference spin_triangular.py:1025-1070."""

    def __init__(self, phys_dim=2, j1=1.0, j2=0.0, j4=0.0, jchi=0.0,
                 q=(-1.0 / 3, -1.0 / 3), dtype=jnp.float64):
        super().__init__(phys_dim=phys_dim, j1=j1, j2=j2, j4=j4, jchi=jchi,
                         diag=1.0, q=q, dtype=dtype)
