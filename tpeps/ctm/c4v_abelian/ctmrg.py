"""C4v-symmetric abelian CTMRG: the single-corner move.

Counterpart of reference ctm/one_site_c4v_abelian/ctmrg_c4v.py:
one enlarged corner, one truncated block-sparse SVD, one edge
absorption per iteration (vs 8 projector pairs for the generic engine
on the equivalent bipartite cell) — the abelian scaling workhorse that
makes the committed D=8 chi=160 states tractable.

Sublattice bookkeeping (reference ctm_MOVE_sl, ctmrg_c4v.py:~210-330):
the stored T is "built from B" (B = flip_signature(A)); the enlarged
corner contracts the stored (C, T, T, A) directly, while the edge
absorption flips (T, A) to their B-referenced forms so the absorbed
row alternates sublattices — the U(1) Neel pattern.  Physical-phase
factors of the sublattice rotation cancel in all double layers.
"""

from __future__ import annotations

import numpy as np

from ...sym.tensor import eigh_blockwise
from ..generic_abelian.components import c2x2_lu
from .env import ENV_C4V_ABELIAN, flip_signature


def _scale_new_leg(t, vecs):
    blocks = {}
    for qs, b in t.blocks.items():
        v = vecs[qs[-1]]
        blocks[qs] = b * v.reshape((1,) * (b.ndim - 1) + (-1,))
    return t.copy_with(blocks)


def c2x2_sl(a, C, T):
    """Enlarged corner from the single (C, T) pair; rank-6
    (rows | cols) with identical signatures on both triples
    (reference ctm_components_c4v.py c2x2_sl)."""
    return c2x2_lu(C, T, T.transpose((0, 3, 1, 2)), a)


def ctm_move_sl(a, env: ENV_C4V_ABELIAN, proj_kwargs):
    """One C4v move (reference ctmrg_c4v.py ctm_MOVE_sl semantics)."""
    C, T = env.C, env.T
    chi = env.chi

    M = c2x2_sl(a, C, T)
    P, W = eigh_blockwise(
        M, (0, 1, 2), (3, 4, 5), chi=chi,
        reltol=proj_kwargs.get("svd_reltol", 1e-8),
        eps_multiplet=proj_kwargs.get("eps_multiplet", 1e-8),
    )  # legs (chi, Dk, Db, new); hermitian corner -> eigh ~5x svd

    # C' = P^dagger M P~ (P~ = signature-flip of P: the col triple of M
    # carries the same signatures as the rows, so the closing projector
    # enters flipped — reference ctmrg_c4v.py "absorb and truncate")
    nC = P.conj().tensordot(M, ((0, 1, 2), (0, 1, 2)))
    nC = nC.tensordot(flip_signature(P), ((1, 2, 3), (0, 1, 2)))

    # T' = P (T_B  B  B*) P with the absorbed row on the other
    # sublattice.  Opening P: its D-pair meets the site's u legs;
    # closing P: its D-pair meets the site's d legs; the site's r-pair
    # becomes the new edge's D-pair (same geometry as the dense move,
    # tpeps/ctm/c4v/move_tpu.py _absorb_T_int).
    Tf = flip_signature(T)
    af = flip_signature(a)
    z = P.tensordot(Tf, ((0,), (0,)))            # (Pk,Pb,n1, tk,tb,cr)
    z = z.tensordot(af, ((0, 3), (1, 2)))        # (Pb,n1,tb,cr, s,d,r)
    z = z.tensordot(af.conj(), ((0, 2, 4), (1, 2, 0)))  # (n1,cr,d,r, d',r')
    nT = z.tensordot(P, ((1, 2, 4), (0, 1, 2)))  # (n1, rk, rb, n2)

    # symmetrize + normalize (reference ctmrg_c4v.py:131-136)
    nC = 0.5 * (nC + nC.transpose((1, 0)).conj_blocks())
    nT = 0.5 * (nT + nT.transpose((3, 1, 2, 0)).conj_blocks())
    smax = max(float(np.max(np.abs(np.asarray(w)))) for w in W.values())
    nC = nC * (1.0 / smax)
    nT = nT * (1.0 / float(nT.max_abs()))
    return ENV_C4V_ABELIAN(chi, nC, nT)


def run(state, env: ENV_C4V_ABELIAN, ctm_cfg, conv_check=None):
    """CTMRG to convergence (host loop; default convergence = l2
    distance of successive normalized corner spectra).

    :return: ``(env, history)``
    """
    a = state.site((0, 0))
    proj_kwargs = dict(
        svd_reltol=ctm_cfg.projector_svd_reltol,
        eps_multiplet=ctm_cfg.projector_eps_multiplet,
    )
    spec_prev = None
    history = {"conv_crit": []}
    for i in range(ctm_cfg.ctm_max_iter):
        env = ctm_move_sl(a, env, proj_kwargs)
        if conv_check is not None:
            converged, history = conv_check(state, env, history)
            if converged:
                break
        else:
            s = env.get_spectrum()
            spec = np.zeros(env.chi)
            spec[: min(env.chi, s.size)] = s[: env.chi]
            if spec[0] > 0:
                spec /= spec[0]
            if spec_prev is not None:
                dist = float(np.linalg.norm(spec - spec_prev))
                history["conv_crit"].append(dist)
                if dist < ctm_cfg.ctm_conv_tol:
                    break
            spec_prev = spec
    return env, history
