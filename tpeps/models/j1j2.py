"""Spin-1/2 J1-J2(-J3, staggered/uniform field, delta_zz, lambda) model.

Counterpart of reference models/j1j2.py:46-925.  Hamiltonian terms are
small constant tensors built once from the SU(2) operator algebra and
baked into jitted energy contractions; energies consume RDMs from
:mod:`tpeps.ctm.c4v.rdm` (and the generic RDMs for multi-site cells).
"""

from __future__ import annotations

from math import sqrt

import jax.numpy as jnp

from ..ctm.c4v import corrf as corrf_c4v
from ..ctm.c4v import rdm as rdm_c4v
from ..ctm.c4v.env import EnvC4v
from ..ctm.generic import corrf as corrf_gen
from ..ctm.generic import rdm as rdm_gen
from ..groups import su2


def _cast_to_real(t):
    return t.real if jnp.iscomplexobj(t) else t


class J1J2:
    """Common Hamiltonian-term construction (reference models/j1j2.py:46-186)."""

    def __init__(
        self, j1=1.0, j2=0.0, j3=0.0, hz_stag=0.0, delta_zz=1.0, lmbd=0.0,
        h_uni=(0.0, 0.0, 0.0), dtype=jnp.float64,
    ):
        self.dtype = dtype
        self.phys_dim = 2
        self.j1, self.j2, self.j3 = j1, j2, j3
        self.lmbd = lmbd
        self.hz_stag = hz_stag
        self.delta_zz = delta_zz
        self.h_uni = jnp.asarray(h_uni, dtype=dtype)
        self._h_uni_norm = float(sum(abs(h) ** 2 for h in h_uni) ** 0.5)

        is_cplx = jnp.issubdtype(dtype, jnp.complexfloating)
        if lmbd != 0 or h_uni[2] != 0:
            assert is_cplx, "lambda / h^y terms require complex dtype"

        s2 = su2.SU2(self.phys_dim, dtype=dtype)
        id2 = s2.I_N(N=2)
        id3 = s2.I_N(N=3)
        kron = lambda x, y: jnp.einsum("ij,ab->iajb", x, y)

        self.SS_delta_zz = s2.SS(xyz=(delta_zz, 1.0, 1.0))
        self.SS = s2.SS()
        h_uni_1x1 = jnp.einsum("x,xia->ia", self.h_uni, s2.S())
        hz_2x1_nn = kron(s2.SZ(), s2.I()) + kron(s2.I(), -s2.SZ())
        huni_2x1_nn = kron(h_uni_1x1, s2.I()) + kron(s2.I(), h_uni_1x1)

        rot = s2.BP_rot()
        rot2 = lambda op: jnp.einsum("ki,kjcb,ca->ijab", rot, op, rot)
        self.SS_rot = rot2(self.SS)
        self.SS_delta_zz_rot = rot2(self.SS_delta_zz)
        self.hz_2x1_rot = rot2(hz_2x1_nn)
        self.huni_2x1_rot = rot2(huni_2x1_nn)

        # plaquette terms h_p such that e = <h_p> (reference j1j2.py:123-147)
        h2x2_SS_dzz = jnp.einsum("ijab,klcd->ijklabcd", self.SS_delta_zz, id2)
        h2x2_SS = jnp.einsum("ijab,klcd->ijklabcd", self.SS, id2)
        h2x2_hz = jnp.einsum("ia,jklbcd->ijklabcd", s2.SZ(), id3)
        h2x2_hu = jnp.einsum("ia,jklbcd->ijklabcd", h_uni_1x1, id3)

        def get_hp(coord):
            perm = lambda t, p: t.transpose(p)
            hp = 0.5 * self.j1 * (
                h2x2_SS_dzz
                + perm(h2x2_SS_dzz, (0, 2, 1, 3, 4, 6, 5, 7))
                + perm(h2x2_SS_dzz, (2, 3, 0, 1, 6, 7, 4, 5))
                + perm(h2x2_SS_dzz, (3, 1, 2, 0, 7, 5, 6, 4))
            ) + self.j2 * (
                perm(h2x2_SS, (0, 3, 2, 1, 4, 7, 6, 5))
                + perm(h2x2_SS, (2, 1, 0, 3, 6, 5, 4, 7))
            ) - 0.25 * self.hz_stag * ((-1) ** (coord[0] + coord[1])) * (
                h2x2_hz
                - perm(h2x2_hz, (3, 0, 1, 2, 7, 4, 5, 6))
                - perm(h2x2_hz, (2, 3, 0, 1, 6, 7, 4, 5))
                + perm(h2x2_hz, (1, 2, 3, 0, 5, 6, 7, 4))
            ) + 0.25 * (
                h2x2_hu
                + perm(h2x2_hu, (2, 3, 0, 1, 6, 7, 4, 5))
                + perm(h2x2_hu, (3, 0, 1, 2, 7, 4, 5, 6))
                + perm(h2x2_hu, (1, 2, 3, 0, 5, 6, 7, 4))
            )
            return hp

        self.get_hp = get_hp
        self.hp_rot = jnp.einsum(
            "xj,yk,ixylauvd,ub,vc->ijklabcd", rot, rot, get_hp((0, 0)), rot, rot
        )

        self.obs_ops = self.get_obs_ops()

    def get_obs_ops(self):
        s2 = su2.SU2(self.phys_dim, dtype=self.dtype)
        return {"sz": s2.SZ(), "sp": s2.SP(), "sm": s2.SM()}

    # ------------------------------------------------------------------
    # generic unit-cell energies (reference models/j1j2.py:187-475):
    # all plaquette terms are aggregated in hp, so the energy is the
    # average of <hp> over the non-equivalent 2x2 plaquettes.
    # ------------------------------------------------------------------
    def eval_nnnn_per_site(self, coord, state, env):
        """Next-to-next nearest neighbour <S.S> at distance 2 in x and y
        (reference models/j1j2.py:27-45)."""
        sites, site_of = state.sites, state.vertexToSite
        ops = self.obs_ops

        def cf(direction, o1, o2):
            return corrf_gen.corrf_1sO1sO(
                coord, direction, sites, site_of, env.C, env.T, o1, lambda r: o2, 2
            )[1]

        nnnn = 0.0
        for direction in [(1, 0), (0, 1)]:
            nnnn = nnnn + cf(direction, ops["sz"], ops["sz"])
            nnnn = nnnn + 0.5 * (
                cf(direction, ops["sp"], ops["sm"]) + cf(direction, ops["sm"], ops["sp"])
            )
        return nnnn

    def energy_per_site(self, state, env):
        """Average plaquette energy over the unit cell
        (reference models/j1j2.py:218-243 ``energy_per_site``)."""
        assert self.lmbd == 0, "lambda term not yet supported for generic cells"
        sites, site_of = state.sites, state.vertexToSite
        e = 0.0
        for coord in sites:
            rho = rdm_gen.rdm2x2(coord, sites, site_of, env.C, env.T)
            e = e + jnp.einsum("ijklabcd,ijklabcd", rho, self.get_hp(coord))
            if abs(self.j3) > 0:
                e = e + self.j3 * self.eval_nnnn_per_site((0, 0), state, env)
        return _cast_to_real(e / len(sites))

    def energy_2x2_1site_BP(self, state, env):
        """1-site ansatz with bipartite rotation: single rotated plaquette
        (reference models/j1j2.py:187-217)."""
        rho = rdm_gen.rdm2x2((0, 0), state.sites, state.vertexToSite, env.C, env.T)
        e = jnp.einsum("ijklabcd,ijklabcd", rho, self.hp_rot)
        return _cast_to_real(e)

    # 2SITE/4SITE/8SITE tilings all evaluate the same plaquette average
    # (reference models/j1j2.py:244-385)
    energy_2x2_2site = energy_per_site
    energy_2x2_4site = energy_per_site
    energy_2x2_8site = energy_per_site

    def eval_obs(self, state, env):
        """Per-site magnetizations + all NN bond <S.S>
        (reference models/j1j2.py:387-442)."""
        sites, site_of = state.sites, state.vertexToSite
        obs = {}
        for coord in sites:
            rho = rdm_gen.rdm1x1(coord, sites, site_of, env.C, env.T)
            for label, op in self.obs_ops.items():
                obs[f"{label}{coord}"] = complex(jnp.trace(rho @ op))
            obs[f"m{coord}"] = sqrt(
                abs(obs[f"sz{coord}"] ** 2 + obs[f"sp{coord}"] * obs[f"sm{coord}"])
            )
        for coord in sites:
            rho_h = rdm_gen.rdm2x1(coord, sites, site_of, env.C, env.T)
            rho_v = rdm_gen.rdm1x2(coord, sites, site_of, env.C, env.T)
            obs[f"SS2x1{coord}"] = complex(
                jnp.einsum("ijab,ijab", rho_h, self.SS_delta_zz)
            ).real
            obs[f"SS1x2{coord}"] = complex(
                jnp.einsum("ijab,ijab", rho_v, self.SS_delta_zz)
            ).real
        labels = (
            [f"m{c}" for c in sites]
            + [f"{l}{c}" for c in sites for l in self.obs_ops]
            + [f"SS2x1{c}" for c in sites]
            + [f"SS1x2{c}" for c in sites]
        )
        return [obs[l] for l in labels], labels


class J1J2_C4V_BIPARTITE(J1J2):
    """J1-J2-J3 on the square lattice with a 1-site C4v ansatz and
    bipartite sublattice rotation (reference models/j1j2.py:532-925)."""

    def energy_1x1(self, a, env: EnvC4v):
        """Energy per site from the full 2x2-plaquette RDM
        (reference j1j2.py:592-641)."""
        assert self.lmbd == 0, (
            "energy_1x1 does not include the lambda chiral plaquette term; "
            "use J1J2LAMBDA_C4V_BIPARTITE (tpeps.models.j1j2lambda)"
        )
        rho2x2 = rdm_c4v.rdm2x2(a, env, sym_pos_def=True)
        e = jnp.einsum("ijklabcd,ijklabcd", rho2x2, self.hp_rot)
        if abs(self.j3) > 0:
            rho3x1 = rdm_c4v.rdm3x1(a, env, sym_pos_def=True)
            ss31 = jnp.einsum("ijab,ijab", rho3x1, self.SS)
            e = e + 2 * self.j3 * ss31
        return _cast_to_real(e)

    def energy_1x1_lowmem(self, a, env: EnvC4v):
        """Energy per site from NN + NNN + 3x1 RDMs
        (reference j1j2.py:643-679) — the canonical optimization target of
        examples/j1j2/optim_j1j2_c4v.py."""
        assert self.lmbd == 0, "energy_1x1_lowmem does not include the lambda term"
        rho_nn = rdm_c4v.rdm2x2_NN_lowmem_sl(a, env, sym_pos_def=True)
        e = 2.0 * self.j1 * jnp.einsum("ijkl,ijkl", rho_nn, self.SS_delta_zz_rot)
        e = e - 0.5 * self.hz_stag * jnp.einsum("ijkl,ijkl", rho_nn, self.hz_2x1_rot)
        if self._h_uni_norm > 0:
            e = e + 0.5 * jnp.einsum("ijkl,ijkl", rho_nn, self.huni_2x1_rot)
        if abs(self.j2) > 0:
            rho_nnn = rdm_c4v.rdm2x2_NNN_lowmem_sl(a, env, sym_pos_def=True)
            e = e + 2.0 * self.j2 * jnp.einsum("ijkl,ijkl", rho_nnn, self.SS)
        if abs(self.j3) > 0:
            rho3x1 = rdm_c4v.rdm3x1_sl(a, env, sym_pos_def=True)
            e = e + 2 * self.j3 * jnp.einsum("ijab,ijab", rho3x1, self.SS)
        return _cast_to_real(e)

    def energy_1x1_tiled(self, a, env: EnvC4v):
        """Energy per site through the ``*_tiled`` RDM entry points
        (reference j1j2.py:681-721, ``energy_1x1_tiled``); in tpeps the
        tiled variants delegate to the fused lowmem contractions — XLA
        already tiles them — so this is an API-parity alias path."""
        assert self.lmbd == 0, "energy_1x1_tiled does not include the lambda term"
        rho_nn = rdm_c4v.rdm2x2_NN_tiled(a, env, sym_pos_def=True)
        e = 2.0 * self.j1 * jnp.einsum("ijkl,ijkl", rho_nn, self.SS_delta_zz_rot)
        e = e - 0.5 * self.hz_stag * jnp.einsum("ijkl,ijkl", rho_nn, self.hz_2x1_rot)
        if self._h_uni_norm > 0:
            e = e + 0.5 * jnp.einsum("ijkl,ijkl", rho_nn, self.huni_2x1_rot)
        if abs(self.j2) > 0:
            rho_nnn = rdm_c4v.rdm2x2_NNN_tiled(a, env, sym_pos_def=True)
            e = e + 2.0 * self.j2 * jnp.einsum("ijkl,ijkl", rho_nnn, self.SS)
        if abs(self.j3) > 0:
            rho3x1 = rdm_c4v.rdm3x1_sl(a, env, sym_pos_def=True)
            e = e + 2 * self.j3 * jnp.einsum("ijab,ijab", rho3x1, self.SS)
        return _cast_to_real(e)

    def eval_obs(self, a, env: EnvC4v):
        """Observables (m, <sz>, <sp>, <sm>, SS2x1, [SS_nnn], [SS3x1]) —
        reference models/j1j2.py:722-783."""
        obs = {}
        if abs(self.j3) > 0:
            rho3x1 = rdm_c4v.rdm3x1(a, env)
            obs["SS3x1"] = complex(jnp.einsum("ijab,ijab", rho3x1, self.SS)).real
        if abs(self.j2) > 0:
            rho_nnn = rdm_c4v.rdm2x2_NNN_lowmem_sl(a, env)
            obs["SS_nnn"] = complex(jnp.einsum("ijab,ijab", rho_nnn, self.SS)).real

        rho2x1 = rdm_c4v.rdm2x1_sl(a, env)
        obs["SS2x1"] = complex(jnp.einsum("ijab,ijab", rho2x1, self.SS_rot)).real

        rho1x1 = jnp.einsum("ijaj->ia", rho2x1)
        rho1x1 = rho1x1 / jnp.trace(rho1x1)
        for label, op in self.obs_ops.items():
            obs[label] = complex(jnp.trace(rho1x1 @ op))
        obs["m"] = sqrt(abs(obs["sz"] ** 2 + obs["sp"] * obs["sm"]))

        labels = ["m"] + list(self.obs_ops.keys()) + ["SS2x1"]
        if abs(self.j2) > 0:
            labels += ["SS_nnn"]
        if abs(self.j3) > 0:
            labels += ["SS3x1"]
        return [obs[l] for l in labels], labels

    def eval_corrf_SS(self, a, env: EnvC4v, dist: int):
        """Spin-spin correlations <S(0).S(r)> with bipartite rotation of
        the second operator (reference models/j1j2.py:803-857)."""
        sz = self.obs_ops["sz"]
        sx = 0.5 * (self.obs_ops["sp"] + self.obs_ops["sm"])
        isy = -0.5 * (self.obs_ops["sp"] - self.obs_ops["sm"])  # i*Sy

        rot = su2.get_rot_op(self.phys_dim, dtype=self.dtype)

        def bilat(op):
            op_rot = jnp.einsum("ki,kl,lj->ij", rot, op, rot)
            return lambda r: op_rot if r % 2 == 0 else op

        szsz = corrf_c4v.corrf_1sO1sO(a, env, sz, bilat(sz), dist)
        sxsx = corrf_c4v.corrf_1sO1sO(a, env, sx, bilat(sx), dist)
        nsysy = corrf_c4v.corrf_1sO1sO(a, env, isy, bilat(isy), dist)
        return {"ss": szsz + sxsx - nsysy, "szsz": szsz, "sxsx": sxsx, "sysy": -nsysy}

    def _SS_rot_pair(self):
        """(S.S) with the bipartite rotation applied on the first spin,
        and its image with the rotation on the second spin (reference
        models/j1j2.py:883-886)."""
        rot = su2.get_rot_op(self.phys_dim, dtype=self.dtype)
        SS_rot = jnp.einsum("ki,kjcb,ca->ijab", rot, self.SS, rot)
        return SS_rot, SS_rot.transpose(1, 0, 3, 2)

    def eval_corrf_DD_H(self, a, env: EnvC4v, dist: int):
        """Horizontal dimer-dimer correlations
        <(S(r+3).S(r+2))(S(1).S(0))> (reference models/j1j2.py:864-895)."""
        SS_rot, op_rot = self._SS_rot_pair()
        vals = corrf_c4v.corrf_2sOH2sOH_E1(
            a, env, SS_rot, lambda r: SS_rot if r % 2 == 0 else op_rot, dist)
        return {"dd": vals}

    def eval_corrf_DD_V(self, a, env: EnvC4v, dist: int):
        """Vertical dimer-dimer correlations
        <(S(r+1,1).S(r+1,0))(S(0,1).S(0,0))> through the width-2 channel
        (reference models/j1j2.py:896-926)."""
        SS_rot, op_rot = self._SS_rot_pair()
        vals = corrf_c4v.corrf_2sOV2sOV_E2(
            a, env, SS_rot, lambda r: SS_rot if r % 2 == 0 else op_rot, dist)
        return {"dd": vals}
