"""Spinless t-V fermions on the honeycomb lattice (reference
models/fermion/tv_model.py:14-488).

The honeycomb is embedded in the square lattice by fusing its two
sublattice sites A/B into one square-lattice site; the reference labels
the two local fermionic modes with the "spin" of
``yastn.operators.SpinfulFermions`` (A = up, B = down,
tv_model.py:48-53).  Hamiltonian terms per square-lattice site (the
sign/gauge structure of the embedding follows tv_model.py:119-232
term for term):

* onsite:      V1 nA nB - mu (nA + nB) - t1 (cpA cB + cpB cA) + m (nA - nB)
* horizontal:  V1 <nB nA> + V2 (<nB nB> + <nA nA>)
               + t1 (<cB cpA> + h.c.)
               + Re[t2 e^{i phi} (<cA cpA> + h.c.)]
               - Re[t2 e^{i phi} (<cpB cB> + h.c.)]
* vertical:    V1 <nA nB> + V2 (<nB nB> + <nA nA>)
               - Re[t1 (<cpA cB> + h.c.)]
               + Re[t2 e^{i phi} (<cA cpA> + h.c.)] - Re[t2 e^{i phi} (<cpB cB> + h.c.)]
* diagonal  (site, site+(1,1)):
               V2 (<nA nA> + <nB nB>) + V3 (<nA nB> + <nB nA>)
               - Re[t2 e^{i phi}(<cpA cA> + h.c.)] + Re[t2 e^{i phi}(<cB cpB> + h.c.)]
               + Re[t3 (<cB cpA> + h.c.)] + Re[t3 (<cA cpB> + h.c.)]
* anti-diag (site+(0,1), site+(1,0)):
               V3 <nB nA> + Re[t3 (<cB cpA> + h.c.)]

Evaluation runs through the fermionic double-layer CTM
(:mod:`tpeps.ctm.generic.dl` + :mod:`tpeps.ctm.generic.dl_fermi`):
the graded on-site tensor is compiled once into sign-dressed bosonic
double tensors (norm, open, and per-geometry string-dressed open
variants), the standard dl CTMRG converges the environment, and every
expectation value is a plain dense contraction of a dl RDM with the
operators' dense matrices.  The dressings are exact — solved and
verified against brute-force Grassmann oracles (see
tests/test_fermionic_dl.py) — so no swap gates or graded arithmetic
appear anywhere in the hot path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...ctm.generic.dl import (
    init_env_dl,
    rdm1x1_dl,
    rdm1x2_dl,
    rdm2x1_dl,
    rdm2x2_anti_dl,
    rdm2x2_diag_dl,
    run_dl,
)
from ...ctm.generic.dl_fermi import (
    PAIR_FOCK_SIGN,
    PAIR_STRINGS,
    double_tensor,
    double_tensor_open,
)
from ...groups.fermions import SpinfulFermionsU1


def _dense(op):
    """Dense matrix of a 2-leg graded operator in the phys basis."""
    return np.asarray(op.to_dense())


class TVModel:
    """t-V model evaluated over the fermionic double-layer CTM.

    Usage::

        model = TVModel(t1=..., t2=..., t3=..., phi=...)
        E = model.build_E(a)                       # graded a[s,u,l,d,r]
        env, hist = run_dl(E, init_env_dl(E, chi), ctm_cfg)
        e = model.energy_per_site(a, env)
        obs = model.eval_obs(a, env)
    """

    def __init__(self, V1=0.0, V2=0.0, V3=0.0, t1=1.0, t2=0.0, t3=0.0,
                 phi=0.0, mu=0.0, m=0.0, shift=-1):
        self.V1, self.V2, self.V3 = V1, V2, V3
        self.t1, self.t2, self.t3 = t1, t2, t3
        self.phi, self.mu, self.m = phi, mu, m
        sf = SpinfulFermionsU1(shift=shift)
        self.sf = sf
        self.I = _dense(sf.I())
        self.nA, self.nB = _dense(sf.n("u")), _dense(sf.n("d"))
        self.cA, self.cpA = _dense(sf.c("u")), _dense(sf.cp("u"))
        self.cB, self.cpB = _dense(sf.c("d")), _dense(sf.cp("d"))
        mm = lambda a, b: a @ b  # noqa: E731
        self.h_onsite = (
            V1 * mm(self.nA, self.nB)
            + (-mu) * (self.nA + self.nB)
            + (-t1) * (mm(self.cpA, self.cB) + mm(self.cpB, self.cA))
            + m * (self.nA - self.nB)
        )

    # ------------------------------------------------------- compilation
    def build_E(self, a):
        """Closed fermionic double tensor of the (graded) on-site
        tensor — the dl CTM input."""
        return double_tensor(a)

    def converge(self, a, chi, ctm_cfg):
        E = self.build_E(a)
        return run_dl(E, init_env_dl(E, chi), ctm_cfg)

    def _rhos(self, a, env, blocks=None):
        """All RDMs needed by the energy; jax-traceable (pass
        ``blocks`` to differentiate w.r.t. the on-site tensor)."""
        E = double_tensor(a, blocks=blocks)
        Eo = double_tensor_open(a, blocks=blocks)
        rhos = {"1": rdm1x1_dl(Eo, env),
                "h": rdm2x1_dl(Eo, env),
                "v": rdm1x2_dl(Eo, env),
                "diag": rdm2x2_diag_dl(Eo, E, env),
                "anti": rdm2x2_anti_dl(Eo, E, env)}
        fns = {"h": rdm2x1_dl, "v": rdm1x2_dl}
        for g in ("h", "v"):
            si, sj = PAIR_STRINGS[g]
            rhos[g + "_odd"] = fns[g](
                double_tensor_open(a, si, blocks=blocks), env,
                double_tensor_open(a, sj, blocks=blocks))
        si, sj = PAIR_STRINGS["diag"]
        rhos["diag_odd"] = rdm2x2_diag_dl(
            double_tensor_open(a, si, blocks=blocks), E, env,
            double_tensor_open(a, sj, blocks=blocks))
        si, sj = PAIR_STRINGS["anti"]
        rhos["anti_odd"] = rdm2x2_anti_dl(
            double_tensor_open(a, si, blocks=blocks), E, env,
            double_tensor_open(a, sj, blocks=blocks))
        return rhos

    # ------------------------------------------------------------ energy
    @staticmethod
    def _pair(rho, O0, O1):
        return jnp.einsum("abef,ba,fe->", rho, jnp.asarray(O0), jnp.asarray(O1))

    def energy_per_site(self, a, env, rhos=None, blocks=None):
        """Energy per square-lattice site (= per two honeycomb sites);
        1x1 unit cell (reference tv_model.py:64-237).  jax-traceable
        (pass ``blocks`` for AD w.r.t. the on-site tensor)."""
        r = self._rhos(a, env, blocks=blocks) if rhos is None else rhos
        return self._energy_from_rhos(r)

    def _energy_from_rhos(self, r):
        """Assemble the per-site energy from an RDM dict (keys "1",
        "h", "v", "diag", "anti" + "_odd" string-dressed variants) —
        shared by the 1x1 and multi-cell paths."""
        t2p = self.t2 * np.exp(1j * self.phi)

        rho1 = r["1"]
        e = jnp.einsum("ab,ba->", rho1, jnp.asarray(self.h_onsite)) / jnp.trace(rho1)

        # --- horizontal bond (c, c+x)
        nrm = self._pair(r["h"], self.I, self.I)

        def mh(o0, o1, odd=False):
            if odd:
                return PAIR_FOCK_SIGN["h"] * self._pair(r["h_odd"], o0, o1) / nrm
            return self._pair(r["h"], o0, o1) / nrm

        e += self.V1 * mh(self.nB, self.nA)
        e += self.V2 * (mh(self.nB, self.nB) + mh(self.nA, self.nA))
        res = self.t1 * mh(self.cB, self.cpA, odd=True)
        e += res + jnp.conj(res)
        res = t2p * mh(self.cA, self.cpA, odd=True)
        e += (res + jnp.conj(res)).real
        res = -t2p * mh(self.cpB, self.cB, odd=True)
        e += (res + jnp.conj(res)).real

        # --- vertical bond (c, c+y)
        nrm = self._pair(r["v"], self.I, self.I)

        def mv(o0, o1, odd=False):
            if odd:
                return PAIR_FOCK_SIGN["v"] * self._pair(r["v_odd"], o0, o1) / nrm
            return self._pair(r["v"], o0, o1) / nrm

        e += self.V1 * mv(self.nA, self.nB)
        e += self.V2 * (mv(self.nB, self.nB) + mv(self.nA, self.nA))
        res = -self.t1 * mv(self.cpA, self.cB, odd=True)
        e += (res + jnp.conj(res)).real
        res = t2p * mv(self.cA, self.cpA, odd=True)
        e += (res + jnp.conj(res)).real
        res = -t2p * mv(self.cpB, self.cB, odd=True)
        e += (res + jnp.conj(res)).real

        if any(x != 0 for x in (self.V2, self.V3, self.t2, self.t3)):
            # --- diagonal (c, c+(1,1)); upper-left site first
            nrm = self._pair(r["diag"], self.I, self.I)

            def md(o0, o1, odd=False):
                if odd:
                    return PAIR_FOCK_SIGN["diag"] * self._pair(
                        r["diag_odd"], o0, o1) / nrm
                return self._pair(r["diag"], o0, o1) / nrm

            e += self.V2 * (md(self.nA, self.nA) + md(self.nB, self.nB))
            e += self.V3 * (md(self.nA, self.nB) + md(self.nB, self.nA))
            res = -t2p * md(self.cpA, self.cA, odd=True)
            e += (res + jnp.conj(res)).real
            res = t2p * md(self.cB, self.cpB, odd=True)
            e += (res + jnp.conj(res)).real
            res = self.t3 * md(self.cB, self.cpA, odd=True)
            e += (res + jnp.conj(res)).real
            res = self.t3 * md(self.cA, self.cpB, odd=True)
            e += (res + jnp.conj(res)).real

            # --- anti-diagonal pair (c+(0,1), c+(1,0)); the dl RDM
            # orders (upper-right, lower-left), the reference's
            # [site_b, site_r] = (lower-left, upper-right) order is the
            # REVERSE: swap even ops freely, odd pairs anticommute.
            nrm = self._pair(r["anti"], self.I, self.I)

            def ma_rev(o_ll, o_ur, odd):
                if odd:
                    # physical <O_ur O_ll> then anticommuted to the
                    # reference's (lower-left, upper-right) order
                    v = PAIR_FOCK_SIGN["anti"] * self._pair(
                        r["anti_odd"], o_ur, o_ll) / nrm
                    return -v
                return self._pair(r["anti"], o_ur, o_ll) / nrm

            e += self.V3 * ma_rev(self.nB, self.nA, odd=False)
            res = self.t3 * ma_rev(self.cB, self.cpA, odd=True)
            e += (res + jnp.conj(res)).real

        return jnp.real(e)

    # --------------------------------------------------------------- obs
    def eval_obs(self, a, env, blocks=None):
        Eo = double_tensor_open(a, blocks=blocks)
        rho1 = rdm1x1_dl(Eo, env)
        nrm = jnp.trace(rho1)
        obs = {
            "nA_(0, 0)": jnp.real(
                jnp.einsum("ab,ba->", rho1, jnp.asarray(self.nA)) / nrm),
            "nB_(0, 0)": jnp.real(
                jnp.einsum("ab,ba->", rho1, jnp.asarray(self.nB)) / nrm),
        }
        return obs

    # ------------------------------------------------------ multi-site cell
    # Counterpart of the reference's cell-general energy_per_site
    # (tv_model.py:64-237 iterates psi.sites()/bonds of an arbitrary
    # RectangularUnitcell): per-site sign-dressed double tensors +
    # the coordinate-general dl engine (tpeps/ctm/generic/dl_cell.py).

    def converge_cell(self, state, chi, ctm_cfg, blocks=None):
        """Converge the multi-site-cell dl environment of an
        ``IPEPS_ABELIAN`` ``state`` (any unit cell)."""
        from ...ctm.generic.dl_cell import init_env_dl_cell, run_dl_cell

        Es = {c: double_tensor(a, blocks=_blk(blocks, c))
              for c, a in state.sites.items()}
        env0 = init_env_dl_cell(Es, state.vertexToSite, chi)
        return run_dl_cell(Es, state.vertexToSite, env0, ctm_cfg)

    def _rhos_cell(self, state, env, coord, blocks=None):
        """The per-coordinate RDM dict (same keys as :meth:`_rhos`)
        from the cell environment."""
        from ...ctm.generic import dl_cell as dc

        so = state.vertexToSite
        x, y = coord

        def site(c):
            return state.sites[so(c)]

        def eo(c, string=()):
            return double_tensor_open(site(c), string,
                                      blocks=_blk(blocks, so(c)))

        Es = {c: double_tensor(a, blocks=_blk(blocks, c))
              for c, a in state.sites.items()}
        rhos = {
            "1": dc.rdm1x1_dl_cell(coord, eo(coord), so, env),
            "h": dc.rdm2x1_dl_cell(coord, eo(coord), eo((x + 1, y)), so, env),
            "v": dc.rdm1x2_dl_cell(coord, eo(coord), eo((x, y + 1)), so, env),
            "diag": dc.rdm2x2_diag_dl_cell(
                coord, eo(coord), eo((x + 1, y + 1)), Es, so, env),
            "anti": dc.rdm2x2_anti_dl_cell(
                coord, eo((x + 1, y)), eo((x, y + 1)), Es, so, env),
        }
        si, sj = PAIR_STRINGS["h"]
        rhos["h_odd"] = dc.rdm2x1_dl_cell(
            coord, eo(coord, si), eo((x + 1, y), sj), so, env)
        si, sj = PAIR_STRINGS["v"]
        rhos["v_odd"] = dc.rdm1x2_dl_cell(
            coord, eo(coord, si), eo((x, y + 1), sj), so, env)
        si, sj = PAIR_STRINGS["diag"]
        rhos["diag_odd"] = dc.rdm2x2_diag_dl_cell(
            coord, eo(coord, si), eo((x + 1, y + 1), sj), Es, so, env)
        si, sj = PAIR_STRINGS["anti"]
        rhos["anti_odd"] = dc.rdm2x2_anti_dl_cell(
            coord, eo((x + 1, y), si), eo((x, y + 1), sj), Es, so, env)
        return rhos

    def energy_per_site_cell(self, state, env, blocks=None):
        """Cell-averaged energy per square-lattice site over the dl
        cell environment; jax-traceable through ``blocks`` (a dict
        site-key -> block dict)."""
        coords = sorted(state.sites.keys())
        e = 0.0
        for c in coords:
            e = e + self._energy_from_rhos(
                self._rhos_cell(state, env, c, blocks=blocks))
        return jnp.real(e) / len(coords)

    def eval_obs_cell(self, state, env, blocks=None):
        obs = {}
        for c in sorted(state.sites.keys()):
            rho1 = _rho1_cell(state, env, c, blocks=blocks)
            nrm = jnp.trace(rho1)
            for nm, op in (("nA", self.nA), ("nB", self.nB)):
                obs[f"{nm}_{c}"] = jnp.real(
                    jnp.einsum("ab,ba->", rho1, jnp.asarray(op)) / nrm)
        return obs


def _blk(blocks, c):
    """Per-site block override lookup (None passes through)."""
    return None if blocks is None else blocks.get(c)


def _rho1_cell(state, env, coord, blocks=None):
    from ...ctm.generic.dl_cell import rdm1x1_dl_cell

    so = state.vertexToSite
    a = state.sites[so(coord)]
    return rdm1x1_dl_cell(
        coord, double_tensor_open(a, blocks=_blk(blocks, so(coord))),
        so, env)


# ------------------------------------------------------- measurement API
# Mirror of the reference's EnvCTM-style measurement surface
# (tv_model.py:64-238 _measure_1site/_measure_nn/_measure_2x2 over
# yastn.tn.fpeps.EnvCTM): graded operators go in, the string-dressed dl
# RDMs and Fock signs are applied automatically based on the operator
# parity — callers never touch swap gates.


def _op_parity(op):
    """Parity of a graded 2-leg operator (0 = even, 1 = odd)."""
    from ...sym.tensor import _parity

    return _parity(op.sym, op.n)


def measure_1site(a, env, op, blocks=None):
    """<op> on the fused honeycomb site (reference tv_model.py:107)."""
    Eo = double_tensor_open(a, blocks=blocks)
    rho = rdm1x1_dl(Eo, env)
    return jnp.einsum("ab,ba->", rho, jnp.asarray(_dense(op))) / jnp.trace(rho)


def measure_nn(a, env, op0, op1, geometry="h", blocks=None):
    """<op0 op1> on a bond (reference tv_model.py:111 ``_measure_nn`` /
    :115 ``_measure_2x2``).

    :param geometry: "h" (site, site+x), "v" (site, site+y),
        "diag" (site, site+(1,1)), "anti" (site+(0,1), site+(1,0)) —
        for "anti" the operator order is (upper-right, lower-left),
        the dl RDM's native order.
    :param op0, op1: graded operators; odd pairs are routed through the
        string-dressed RDMs with the exact Fock sign
        (tpeps/ctm/generic/dl_fermi.py PAIR_STRINGS/PAIR_FOCK_SIGN).
    """
    p0, p1 = _op_parity(op0), _op_parity(op1)
    assert (p0 + p1) % 2 == 0, "odd total parity has vanishing expectation"
    odd = p0 == 1
    E = double_tensor(a, blocks=blocks)
    Eo = double_tensor_open(a, blocks=blocks)
    fns = {"h": lambda x, y=None: rdm2x1_dl(x, env, y),
           "v": lambda x, y=None: rdm1x2_dl(x, env, y),
           "diag": lambda x, y=None: rdm2x2_diag_dl(x, E, env, y),
           "anti": lambda x, y=None: rdm2x2_anti_dl(x, E, env, y)}
    rho_even = fns[geometry](Eo)
    nrm = jnp.einsum("abef,ba,fe->", rho_even, jnp.asarray(np.eye(4)),
                     jnp.asarray(np.eye(4)))
    O0, O1 = jnp.asarray(_dense(op0)), jnp.asarray(_dense(op1))
    if not odd:
        return jnp.einsum("abef,ba,fe->", rho_even, O0, O1) / nrm
    si, sj = PAIR_STRINGS[geometry]
    rho_odd = fns[geometry](double_tensor_open(a, si, blocks=blocks),
                            double_tensor_open(a, sj, blocks=blocks))
    return PAIR_FOCK_SIGN[geometry] * jnp.einsum(
        "abef,ba,fe->", rho_odd, O0, O1) / nrm


def measure_1site_cell(state, env, op, coord=(0, 0), blocks=None):
    """``<op>`` at ``coord`` of a multi-site-cell state over the dl
    cell environment (reference tv_model.py:107 on arbitrary cells)."""
    rho = _rho1_cell(state, env, coord, blocks=blocks)
    return jnp.einsum("ab,ba->", rho, jnp.asarray(_dense(op))) / jnp.trace(rho)


def measure_nn_cell(state, env, op0, op1, coord=(0, 0), geometry="h",
                    blocks=None):
    """``<op0 op1>`` on the bond at ``coord`` of a multi-site-cell
    state (geometries as in :func:`measure_nn`; ``op0`` acts at the
    bond's first site — for "anti" that is ``coord + (1, 0)``)."""
    from ...ctm.generic import dl_cell as dc

    p0, p1 = _op_parity(op0), _op_parity(op1)
    assert (p0 + p1) % 2 == 0, "odd total parity has vanishing expectation"
    odd = p0 == 1
    so = state.vertexToSite
    x, y = coord
    second = {"h": (x + 1, y), "v": (x, y + 1),
              "diag": (x + 1, y + 1), "anti": (x, y + 1)}[geometry]
    first = (x + 1, y) if geometry == "anti" else coord

    def eo(c, string=()):
        return double_tensor_open(state.sites[so(c)], string,
                                  blocks=_blk(blocks, so(c)))

    if geometry in ("diag", "anti"):
        Es = {c: double_tensor(a, blocks=_blk(blocks, c))
              for c, a in state.sites.items()}
        fn = {"diag": dc.rdm2x2_diag_dl_cell,
              "anti": dc.rdm2x2_anti_dl_cell}[geometry]
        rho = lambda e0, e1: fn(coord, e0, e1, Es, so, env)  # noqa: E731
    else:
        fn = {"h": dc.rdm2x1_dl_cell, "v": dc.rdm1x2_dl_cell}[geometry]
        rho = lambda e0, e1: fn(coord, e0, e1, so, env)  # noqa: E731

    rho_even = rho(eo(first), eo(second))
    nrm = jnp.einsum("aaff->", rho_even)
    O0, O1 = jnp.asarray(_dense(op0)), jnp.asarray(_dense(op1))
    if not odd:
        return jnp.einsum("abef,ba,fe->", rho_even, O0, O1) / nrm
    si, sj = PAIR_STRINGS[geometry]
    rho_odd = rho(eo(first, si), eo(second, sj))
    return PAIR_FOCK_SIGN[geometry] * jnp.einsum(
        "abef,ba,fe->", rho_odd, O0, O1) / nrm


# --------------------------------------------------------- state factories
# Counterparts of the reference's random-state zoo
# (tv_model.py:488-1131): 1x1 factories plus the multi-cell pattern
# families over the coordinate-general dl engine
# (tpeps/ctm/generic/dl_cell.py), and the honeycomb-iPESS factory
# (``random_ipess_state``/``ipess_site``, ref :946-1006).


def phys_leg_u1():
    """The fused honeycomb physical leg of the shifted-U(1) spinful-
    fermion basis: charges (-1: |00>, 0: |01>,|10>, +1: |11>) with odd
    grading shift (matches the committed CI_D3 state's leg)."""
    from ...sym.tensor import leg

    return leg({-1: 1, 0: 2, 1: 1}, pshift=1)


def random_1x1_state_U1(bond_dims, key=0, total_charge=0):
    """Random U(1) graded 1x1 fermionic state ``a[s,u,l,d,r]``
    (reference tv_model.py:909-945 ``random_1x1_state_U1``).

    :param bond_dims: dict aux-leg charge -> dimension, e.g.
        ``{-1: 1, 0: 2, 1: 1}``
    """
    import jax as _jax

    from ...ipeps.ipeps_abelian import IPEPS_ABELIAN
    from ...sym.tensor import AbelianTensor, leg

    aux = leg(dict(bond_dims))
    a = AbelianTensor.random(
        _jax.random.PRNGKey(key), "U1", (1, 1, 1, -1, -1),
        (phys_leg_u1(),) + (aux,) * 4, n=total_charge, fermionic=True)
    a = a * (1.0 / float(a.norm()))
    return IPEPS_ABELIAN("U1", {(0, 0): a}, lX=1, lY=1)


def random_1x1_state_Z2(bond_dims, key=0):
    """Random Z2 graded 1x1 fermionic state (reference
    tv_model.py:529-563 ``random_1x1_state_Z2``); ``bond_dims`` maps
    charges {0, 1} -> dimensions.  The physical leg carries the fused
    parity (even: |00>,|11>; odd: |01>,|10>)."""
    import jax as _jax

    from ...ipeps.ipeps_abelian import IPEPS_ABELIAN
    from ...sym.tensor import AbelianTensor, leg

    assert sorted(bond_dims) == [0, 1], bond_dims
    aux = leg(dict(bond_dims))
    phys = leg({0: 2, 1: 2}, pshift=1)
    a = AbelianTensor.random(
        _jax.random.PRNGKey(key), "Z2", (1, 1, 1, -1, -1),
        (phys,) + (aux,) * 4, n=0, fermionic=True)
    a = a * (1.0 / float(a.norm()))
    return IPEPS_ABELIAN("Z2", {(0, 0): a}, lX=1, lY=1)


def pattern_state(sym, pattern, tensors):
    """Multi-site ``IPEPS_ABELIAN`` from a row-major tiling pattern.

    :param pattern: list of rows (y-major), each a list of tensor ids —
        the counterpart of the reference's ``RectangularUnitcell``
        pattern (tv_model.py:647-1092).
    :param tensors: dict tensor id -> graded site tensor
    """
    from ...ipeps.ipeps_abelian import IPEPS_ABELIAN

    lY, lX = len(pattern), len(pattern[0])
    assert all(len(row) == lX for row in pattern), pattern
    id2coord, sites = {}, {}
    for y, row in enumerate(pattern):
        for x, tid in enumerate(row):
            if tid not in id2coord:
                id2coord[tid] = (x, y)
                sites[(x, y)] = tensors[tid]

    def vertexToSite(coord):
        x, y = coord[0] % lX, coord[1] % lY
        return id2coord[pattern[y][x]]

    return IPEPS_ABELIAN(sym, sites, vertexToSite, lX, lY)


def random_cell_state(pattern, bond_dims, sym="U1", key=0, charges=None):
    """Random fermionic multi-cell state over a tiling ``pattern``
    (generic engine behind the reference's random-state zoo,
    tv_model.py:564-1131).

    :param bond_dims: aux-leg charge -> dimension (shared by all bonds)
    :param charges: optional dict tensor id -> total U(1) charge (the
        reference's "one tensor with an extra charge" filling device)
    """
    import jax as _jax

    from ...sym.tensor import AbelianTensor, leg

    aux = leg(dict(bond_dims))
    phys = phys_leg_u1() if sym == "U1" else leg({0: 2, 1: 2}, pshift=1)
    tids = sorted({t for row in pattern for t in row})
    key = _jax.random.PRNGKey(key) if isinstance(key, int) else key
    tensors = {}
    for tid in tids:
        key, sub = _jax.random.split(key)
        n = 0 if charges is None else charges.get(tid, 0)
        t = AbelianTensor.random(sub, sym, (1, 1, 1, -1, -1),
                                 (phys,) + (aux,) * 4, n=n, fermionic=True)
        tensors[tid] = t * (1.0 / float(t.norm()))
    return pattern_state(sym, pattern, tensors)


def state_2x1(noise=0.0, key=0):
    """The deterministic 2x1 dimer seed |1100> + |0110> per unit cell
    (reference tv_model.py:488-514 ``state_2x1``; U(1)-graded here —
    the finer grading of the same physical state).  Mode order per
    fused square-lattice site is (A, B); the two sites share one
    charge-{-1, 0} bond, all other bonds are trivial."""
    import jax as _jax

    from ...sym.tensor import AbelianTensor, leg

    Lp = phys_leg_u1()
    L1 = leg({0: 1})
    Lb = leg({-1: 1, 0: 1})
    t0 = AbelianTensor("U1", (1, 1, 1, -1, -1), (Lp, L1, L1, L1, Lb), 0,
                       dtype=jnp.complex128, fermionic=True)
    # |11> (phys charge +1) with bond charge -1; |01> (= d+|0>, second
    # state of the phys charge-0 sector) with bond charge 0
    blk = np.zeros((1, 1, 1, 1, 1), dtype=complex)
    blk[0, 0, 0, 0, 0] = 1.0
    t0.blocks[(1, 0, 0, 0, -1)] = jnp.asarray(blk)
    blk = np.zeros((2, 1, 1, 1, 1), dtype=complex)
    blk[1, 0, 0, 0, 0] = 1.0
    t0.blocks[(0, 0, 0, 0, 0)] = jnp.asarray(blk)
    t1 = AbelianTensor("U1", (1, 1, 1, -1, -1), (Lp, L1, Lb, L1, L1), 0,
                       dtype=jnp.complex128, fermionic=True)
    # |00> (phys charge -1) with bond charge -1; |10> (= u+|0>) with 0
    blk = np.zeros((1, 1, 1, 1, 1), dtype=complex)
    blk[0, 0, 0, 0, 0] = 1.0
    t1.blocks[(-1, 0, -1, 0, 0)] = jnp.asarray(blk)
    blk = np.zeros((2, 1, 1, 1, 1), dtype=complex)
    blk[0, 0, 0, 0, 0] = 1.0
    t1.blocks[(0, 0, 0, 0, 0)] = jnp.asarray(blk)
    tensors = {0: t0, 1: t1}
    if noise:
        k = _jax.random.PRNGKey(key)
        for tid, t in tensors.items():
            k, sub = _jax.random.split(k)
            full = AbelianTensor.random(sub, "U1", t.s, t.legs, n=t.n,
                                        fermionic=True)
            for q, b in full.blocks.items():
                t.blocks[q] = t.blocks.get(q, 0.0) + noise * b
            tensors[tid] = t * (1.0 / float(t.norm()))
    return pattern_state("U1", [[0, 1]], tensors)


def random_1x3_state_Z2(bond_dims, key=0):
    """Reference tv_model.py:564 (three columns, Z2)."""
    return random_cell_state([[0, 1, 2]], bond_dims, sym="Z2", key=key)


def random_3x3_state_Z2(bond_dims, key=0):
    """Reference tv_model.py:605 (diagonal-striped A/B/C, Z2)."""
    return random_cell_state([[0, 1, 2], [1, 2, 0], [2, 0, 1]],
                             bond_dims, sym="Z2", key=key)


def random_3x3_state_U1(bond_dims, key=0):
    """Reference tv_model.py:647 (A B C / B C A / C A B, one charged)."""
    return random_cell_state([[0, 1, 2], [1, 2, 0], [2, 0, 1]],
                             bond_dims, key=key, charges={0: 1})


def random_3x3_2_state_U1(bond_dims, key=0):
    """Reference tv_model.py:694 (A B C / C A B / B C A, one charged)."""
    return random_cell_state([[0, 1, 2], [2, 0, 1], [1, 2, 0]],
                             bond_dims, key=key, charges={0: 1})


def random_1x3_state_U1(bond_dims, key=0):
    """Reference tv_model.py:787."""
    return random_cell_state([[0, 1, 2]], bond_dims, key=key, charges={0: 1})


def random_3x1_state_U1(bond_dims, key=0):
    """Reference tv_model.py:871 (three rows)."""
    return random_cell_state([[0], [1], [2]], bond_dims, key=key,
                             charges={0: 1})


def random_1x6_state_U1(bond_dims, key=0):
    """Reference tv_model.py:742/826 (six columns, two charged)."""
    return random_cell_state([[0, 1, 2, 3, 4, 5]], bond_dims, key=key,
                             charges={0: 1, 3: -1})


def random_2x2_state_U1(bond_dims, key=0):
    """Reference tv_model.py:1040 (A B / C D)."""
    return random_cell_state([[0, 1], [2, 3]], bond_dims, key=key)


def random_checkerboard_state_U1(bond_dims, key=0):
    """Reference tv_model.py:1001 (A B / B A)."""
    return random_cell_state([[0, 1], [1, 0]], bond_dims, key=key)


def random_3x3_9_state_U1(bond_dims, key=0):
    """Reference tv_model.py:1081 (nine distinct tensors, three charged)."""
    return random_cell_state([[0, 1, 2], [3, 4, 5], [6, 7, 8]],
                             bond_dims, key=key, charges={0: 1, 4: 1, 8: -2})


def ipess_site(A, B):
    """Square-lattice site tensor from the honeycomb-iPESS pair
    ``A[x, l, b, p]`` / ``B[x, r, t, s]`` (reference tv_model.py:946-1006
    ``random_ipess_state`` inner ``get_tensors``: graded einsum
    ``'xlbp,xrts->tlbrps'`` + hard fusion of the two physical legs).

    Output legs/signature follow the tpeps site convention
    ``a[phys, u, l, d, r]`` = ``(+1, +1, +1, -1, -1)``; the fused
    physical leg lands in the standard Z2 convention of
    :func:`random_1x1_state_Z2` — shifted sector labels
    ``q = (n_A + n_B + 1) mod 2`` with ``pshift=1`` (so the grading is
    the TRUE pair parity) and intra-sector basis order
    ``[|00>, |11>]`` (even) / ``[|01>, |10>]`` (odd) — so the whole
    measurement surface (:func:`measure_1site` / :func:`measure_nn`)
    works on iPESS-built states unchanged.
    """
    site = A.tensordot(B, axes=((0,), (0,)))       # (l, b, p, r, t, s)
    site = site.transpose((4, 0, 1, 3, 2, 5))      # (t, l, b, r, p, s)
    site = site.fuse_pair(4)                       # (t, l, b, r, P)
    # fuse_pair orders each fused sector by sorted (q_p, q_s):
    #   q=0 (odd):  [(0,0)=|10>, (1,1)=|01>]   -> standard [|01>, |10>]
    #   q=1 (even): [(0,1)=|11>, (1,0)=|00>]   -> standard [|00>, |11>]
    # i.e. a flip of the 2-dim physical axis in every sector.  The flip
    # is a plain (even, charge-diagonal) basis relabeling — no grading
    # signs involved.
    site = site.copy_with(
        {q: b[..., ::-1] for q, b in site.blocks.items()})
    return site.transpose((4, 0, 1, 2, 3))         # (P, t, l, b, r)


def random_ipess_state(bond_dims, key=0):
    """Random Z2 honeycomb-iPESS state, coarse-grained to a 1x1
    square-lattice cell (reference tv_model.py:946-1006
    ``random_ipess_state``).

    The on-site tensor is the contraction of two rank-4 elementary
    tensors over the internal honeycomb bond ``x``::

          0       2   1       t(0)  r(3)
          |        \\ /         \\   /
          A--3  x   B--3   =>    B--
         / \\        |            |   -> fused physical (A, B)
        1   2       0            A--
                               /   \\
                             l(1)  b(2)

    ``A`` carries the reference's charge-1 dummy shift
    (``dummy_leg_charge=1``): here the dummy is a ``pshift=1`` sector-1
    leg — the shifted LABEL with inert grading, the same convention as
    :func:`phys_leg_u1` — fused into ``A``'s physical leg before the
    pair contraction.  (yastn grades the dummy by its raw charge
    instead; tpeps keeps the grading physical and shifts only the
    label, which is what the repo's committed-state conventions and
    sign machinery assume.)

    :param bond_dims: dict Z2 charge -> dimension for every aux leg,
        e.g. ``{0: 2, 1: 2}``
    :return: normalized 1x1 ``IPEPS_ABELIAN`` ("Z2", graded)
    """
    import jax as _jax

    from ...ipeps.ipeps_abelian import IPEPS_ABELIAN
    from ...sym.tensor import AbelianTensor, leg

    assert sorted(bond_dims) == [0, 1], bond_dims
    aux = leg(dict(bond_dims))
    p2 = leg({0: 1, 1: 1})
    k1, k2 = _jax.random.split(_jax.random.PRNGKey(key))
    # A[x, l, b, p, dummy] with the label-shifting dummy, then fuse (p, dummy)
    A = AbelianTensor.random(
        k1, "Z2", (-1, 1, -1, 1, 1),
        (aux, aux, aux, p2, leg({1: 1}, pshift=1)), n=0, fermionic=True)
    A = A.fuse_pair(3)                             # (x, l, b, p')
    B = AbelianTensor.random(
        k2, "Z2", (1, -1, 1, 1), (aux, aux, aux, p2), n=0, fermionic=True)
    a = ipess_site(A, B)
    a = a * (1.0 / float(a.norm()))
    return IPEPS_ABELIAN("Z2", {(0, 0): a}, lX=1, lY=1)
