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

All expectation values are evaluated on raw graded RDMs from the
abelian CTM (:mod:`tpeps.ctm.generic_abelian.rdm` with ``raw=True``);
fermionic ordering/anticommutation is carried by the Grassmann-graded
tensor algebra (no swap gates).
"""

from __future__ import annotations

import numpy as np

from ...ctm.generic_abelian import rdm as ardm
from ...groups.fermions import SpinfulFermionsU1, as_bosonic, expval1, expval_pair
from ...ipeps.ipeps_abelian import IPEPS_ABELIAN


def _bosonic_state(state):
    """Bosonic view of a (possibly graded) abelian iPEPS: the RDM patch
    and the environment are contracted bosonically (term-wise equal to
    the graded network, see tpeps.groups.fermions.expval1)."""
    sites = {c: as_bosonic(t) for c, t in state.sites.items()}
    return IPEPS_ABELIAN(state.sym, sites, state.vertexToSite, state.lX, state.lY)


class TVModel:
    def __init__(self, V1=0.0, V2=0.0, V3=0.0, t1=1.0, t2=0.0, t3=0.0,
                 phi=0.0, mu=0.0, m=0.0, shift=-1):
        self.V1, self.V2, self.V3 = V1, V2, V3
        self.t1, self.t2, self.t3 = t1, t2, t3
        self.phi, self.mu, self.m = phi, mu, m
        sf = SpinfulFermionsU1(shift=shift)
        self.sf = sf
        self.I = sf.I()
        self.nA, self.nB = sf.n("u"), sf.n("d")
        self.cA, self.cpA = sf.c("u"), sf.cp("u")
        self.cB, self.cpB = sf.c("d"), sf.cp("d")
        # onsite operator (tv_model.py:120-125)
        mm = sf.matmul
        self.h_onsite = (
            V1 * mm(self.nA, self.nB)
            + (-mu) * (self.nA + self.nB)
            + (-t1) * (mm(self.cpA, self.cB) + mm(self.cpB, self.cA))
            + m * (self.nA + (-1.0) * self.nB)
        )

    # ------------------------------------------------------------ energy
    def energy_per_site(self, state, env):
        """Energy per square-lattice site (= per two honeycomb sites),
        averaged over the unit cell (reference tv_model.py:64-237)."""
        e_tot = 0.0
        t2p = self.t2 * np.exp(1j * self.phi)
        use_2x2 = any(x != 0 for x in (self.V2, self.V3, self.t2, self.t3))
        state = _bosonic_state(state)
        for c in state.sites:
            # --- onsite
            r1 = ardm.rdm1x1(c, state, env, raw=True)
            nrm1 = expval1(r1, self.I)
            e = expval1(r1, self.h_onsite) / nrm1

            # --- horizontal bond (c, c+x)
            rh = ardm.rdm2x1(c, state, env, raw=True)
            nrm = expval_pair(rh, self.I, self.I)

            def mh(o0, o1):
                return expval_pair(rh, o0, o1) / nrm

            e += self.V1 * mh(self.nB, self.nA)
            e += self.V2 * (mh(self.nB, self.nB) + mh(self.nA, self.nA))
            res = self.t1 * mh(self.cB, self.cpA)
            e += res + np.conj(res)
            res = t2p * mh(self.cA, self.cpA)
            e += (res + np.conj(res)).real
            res = -t2p * mh(self.cpB, self.cB)
            e += (res + np.conj(res)).real

            # --- vertical bond (c, c+y)
            rv = ardm.rdm1x2(c, state, env, raw=True)
            nrm = expval_pair(rv, self.I, self.I)

            def mv(o0, o1):
                return expval_pair(rv, o0, o1) / nrm

            e += self.V1 * mv(self.nA, self.nB)
            e += self.V2 * (mv(self.nB, self.nB) + mv(self.nA, self.nA))
            res = -self.t1 * mv(self.cpA, self.cB)
            e += (res + np.conj(res)).real
            res = t2p * mv(self.cA, self.cpA)
            e += (res + np.conj(res)).real
            res = -t2p * mv(self.cpB, self.cB)
            e += (res + np.conj(res)).real

            if use_2x2:
                # --- diagonal (c, c+(1,1)); raw order: upper-left first
                rd = ardm.rdm2x2_NNN_11(c, state, env, raw=True)
                nrm = expval_pair(rd, self.I, self.I)

                def md(o0, o1):
                    return expval_pair(rd, o0, o1) / nrm

                e += self.V2 * (md(self.nA, self.nA) + md(self.nB, self.nB))
                e += self.V3 * (md(self.nA, self.nB) + md(self.nB, self.nA))
                res = -t2p * md(self.cpA, self.cA)
                e += (res + np.conj(res)).real
                res = t2p * md(self.cB, self.cpB)
                e += (res + np.conj(res)).real
                res = self.t3 * md(self.cB, self.cpA)
                e += (res + np.conj(res)).real
                res = self.t3 * md(self.cA, self.cpB)
                e += (res + np.conj(res)).real

                # --- anti-diagonal pair (c+(0,1), c+(1,0)); the raw RDM
                # orders (upper-right, lower-left) so the reference's
                # [site_b, site_r] = (lower-left, upper-right) order is
                # the REVERSE: swap even ops freely, odd pairs
                # anticommute (explicit minus).
                ra = ardm.rdm2x2_NNN_1n1((c[0], c[1] + 1), state, env, raw=True)
                nrm = expval_pair(ra, self.I, self.I)

                def ma_rev(o_ll, o_ur, odd):
                    v = expval_pair(ra, o_ur, o_ll) / nrm
                    return -v if odd else v

                e += self.V3 * ma_rev(self.nB, self.nA, odd=False)
                res = self.t3 * ma_rev(self.cB, self.cpA, odd=True)
                e += (res + np.conj(res)).real

            e_tot += e.real if isinstance(e, complex) else float(np.real(e))
        return e_tot / len(state.sites)

    # --------------------------------------------------------------- obs
    def eval_obs(self, state, env):
        obs = {}
        state = _bosonic_state(state)
        for c in state.sites:
            r1 = ardm.rdm1x1(c, state, env, raw=True)
            nrm = expval1(r1, self.I)
            obs[f"nA_{c}"] = (expval1(r1, self.nA) / nrm).real
            obs[f"nB_{c}"] = (expval1(r1, self.nB) / nrm).real
        return obs
