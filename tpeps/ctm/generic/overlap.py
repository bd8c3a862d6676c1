"""Overlap CTMRG: environments of the mixed network <psi1|psi2>.

Counterpart of reference ctm/generic/ctmrg.py:112-177 ``run_overlap``
and ctm/generic/rdm_overlap.py:8,252 (``rdm2x2_id_overlap`` /
``rdm1x1_id_overlap``) plus the overlap env init (reference
env.py:717).  The reference requires explicit double-layer tensors
(``ctm_force_dl``); here the single-layer engine takes a separate bra
layer (``sites_bra``), so overlaps run at the same memory cost as norm
environments and the two states may carry different bond dimensions.

The per-site fidelity follows from three converged environments::

    f = |lambda_12| / sqrt(lambda_11 * lambda_22)

where ``lambda_ab`` is the 1x1 closure value of the <psi_a|psi_b>
environment (each normalized CTM absorbs one transfer-matrix factor, so
ratios of same-geometry closures are gauge/normalization invariant).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .ctmrg import ctm_move
from .env import ENV, _zero_pad_into


def init_env_overlap(state1, state2, chi: int) -> ENV:
    """PBC-traced mixed double-layer environment (ket = state1,
    bra = state2; reference env.py:717-815 overlap init)."""
    env = ENV(chi)
    dtype = state1.dtype

    def dl(A, B, spec):
        if A.shape == B.shape:
            a = jnp.einsum(spec, A, jnp.conj(B))
        else:
            # different bond dimensions: glue each traced outward pair
            # with a rectangular identity (exact for zero-padded states,
            # otherwise just an initialization)
            ins, out = spec.split("->")
            sA, sB = ins.split(",")
            traced = sorted(set(sA[1:]) & set(sB[1:]))
            eyes = [jnp.eye(A.shape[sA.index(ch)], B.shape[sB.index(ch)])
                    for ch in traced]
            fresh = iter("opqtuvwxyz")
            subs, ops = [sA], [A]
            sB2 = list(sB)
            for ch, ey in zip(traced, eyes):
                nc = next(fresh)
                sB2[sB.index(ch)] = nc
                subs.append(ch + nc)
                ops.append(ey)
            subs.insert(1, "".join(sB2))
            ops.insert(1, jnp.conj(B))
            a = jnp.einsum(",".join(subs) + "->" + out, *ops)
        sh = a.shape
        fused = [sh[i] * sh[i + 1] for i in range(0, len(sh), 2)]
        a = a.reshape(fused)
        return a / jax.lax.stop_gradient(jnp.abs(a).max())

    for coord in state1.sites:
        specs_c = {
            (-1, -1): ((-1, -1), "mijef,mijab->eafb"),
            (1, -1): ((1, -1), "miefj,miabj->eafb"),
            (1, 1): ((1, 1), "mefij,mabij->eafb"),
            (-1, 1): ((-1, 1), "meijf,maijb->eafb"),
        }
        for (dx, dy), (cv, spec) in specs_c.items():
            A = state1.site((coord[0] + dx, coord[1] + dy))
            B = state2.site((coord[0] + dx, coord[1] + dy))
            c = dl(A, B, spec)
            env.C[(coord, cv)] = _zero_pad_into(c, (chi, chi), dtype)

        specs_t = {
            (0, -1): ("miefg,miabc->eafbgc", lambda t: (chi, t.shape[1], chi)),
            (-1, 0): ("meifg,maibc->eafbgc", lambda t: (chi, chi, t.shape[2])),
            (0, 1): ("mefig,mabic->eafbgc", lambda t: (t.shape[0], chi, chi)),
            (1, 0): ("mefgi,mabci->eafbgc", lambda t: (chi, t.shape[1], chi)),
        }
        for (dx, dy), (spec, shape_of) in specs_t.items():
            A = state1.site((coord[0] + dx, coord[1] + dy))
            B = state2.site((coord[0] + dx, coord[1] + dy))
            t = dl(A, B, spec)
            env.T[(coord, (dx, dy))] = _zero_pad_into(t, shape_of(t), dtype)
    return env


def run_overlap(state1, state2, env: ENV, ctm_cfg, conv_check=None):
    """CTMRG on the mixed <psi1|psi2> network (reference ctmrg.py:112).

    Host loop (overlap envs are evaluation-only — no AD path needed);
    convergence via corner-spectra distance as in the norm engine.
    """
    import numpy as np

    site_of = state1.vertexToSite
    sites = state1.sites
    sites_bra = {c: state2.sites[c] for c in state2.sites}
    proj_kwargs = dict(
        svd_reltol=ctm_cfg.projector_svd_reltol,
        eps_multiplet=ctm_cfg.projector_eps_multiplet,
        multiplet_abstol=ctm_cfg.projector_multiplet_abstol,
        ad_decomp_reg=ctm_cfg.ad_decomp_reg,
    )
    move_seq = tuple(tuple(d) for d in ctm_cfg.ctm_move_sequence)
    C, T = env.C, env.T
    spec_prev = None
    history = {"conv_crit": []}
    for _ in range(ctm_cfg.ctm_max_iter):
        for direction in move_seq:
            n = state1.lX if direction in ((-1, 0), (1, 0)) else state1.lY
            for _ in range(n):
                C, T = ctm_move(direction, sites, site_of, C, T, env.chi,
                                proj_kwargs, ctm_cfg.ctm_absorb_normalization,
                                sites_bra=sites_bra)
        specs = [np.asarray(jnp.linalg.svd(C[k], compute_uv=False))
                 for k in sorted(C.keys())]
        spec = np.stack([s / max(s[0], 1e-300) for s in specs])
        if spec_prev is not None and spec.shape == spec_prev.shape:
            dist = float(np.linalg.norm(spec - spec_prev))
            history["conv_crit"].append(dist)
            if dist < ctm_cfg.ctm_conv_tol:
                break
        spec_prev = spec
    out = ENV(env.chi)
    out.C, out.T = C, T
    return out, history


def closure_1x1(coord, state1, state2, env: ENV):
    """The 1x1 closure of the mixed environment: the overlap network's
    per-site transfer value (reference rdm_overlap.py:252
    ``rdm1x1_id_overlap`` with the identity contracted)."""
    c = state1.vertexToSite(coord)
    A, B = state1.sites[c], state2.sites[c]
    C, T = env.C, env.T
    dl = jnp.einsum("suldr,szabc->uzladbrc", A, jnp.conj(B))
    sh = dl.shape
    dl = dl.reshape(sh[0] * sh[1], sh[2] * sh[3], sh[4] * sh[5], sh[6] * sh[7])
    q = jnp.einsum("xy,ymz->xmz", C[(c, (-1, -1))], T[(c, (0, -1))])
    q = jnp.einsum("xmz,xwl->mzwl", q, T[(c, (-1, 0))])
    q = jnp.einsum("mzwl,mldr->zwdr", q, dl)
    q = jnp.einsum("zwdr,zp->pwdr", q, C[(c, (1, -1))])
    q = jnp.einsum("pwdr,prv->wdv", q, T[(c, (1, 0))])
    q = jnp.einsum("wdv,wy->ydv", q, C[(c, (-1, 1))])
    q = jnp.einsum("ydv,dyu->uv", q, T[(c, (0, 1))])
    return jnp.einsum("uv,vu->", q, C[(c, (1, 1))])


def closure_2x1(coord, state1, state2, env: ENV):
    """2x1 closure of the mixed environment (two adjacent columns)."""
    x, y = coord
    site_of = state1.vertexToSite
    C, T = env.C, env.T

    def dl_at(cc):
        c = site_of(cc)
        A, B = state1.sites[c], state2.sites[c]
        t = jnp.einsum("suldr,szabc->uzladbrc", A, jnp.conj(B))
        sh = t.shape
        return t.reshape(sh[0] * sh[1], sh[2] * sh[3], sh[4] * sh[5], sh[6] * sh[7])

    c0, c1 = site_of((x, y)), site_of((x + 1, y))
    q = jnp.einsum("xy,ymz->xmz", C[(c0, (-1, -1))], T[(c0, (0, -1))])
    q = jnp.einsum("xmz,xwl->mzwl", q, T[(c0, (-1, 0))])
    q = jnp.einsum("mzwl,mldr->zwdr", q, dl_at((x, y)))
    q = jnp.einsum("zwdr,wv->zvdr", q, C[(c0, (-1, 1))])
    q = jnp.einsum("zvdr,dvu->zru", q, T[(c0, (0, 1))])
    q = jnp.einsum("zru,znw->runw", q, T[(c1, (0, -1))])
    q = jnp.einsum("runw,nrds->uwds", q, dl_at((x + 1, y)))
    q = jnp.einsum("uwds,dub->wsb", q, T[(c1, (0, 1))])
    q = jnp.einsum("wsb,wp->psb", q, C[(c1, (1, -1))])
    q = jnp.einsum("psb,pst->tb", q, T[(c1, (1, 0))])
    return jnp.einsum("tb,tb->", q, C[(c1, (1, 1))])


def closure_2x2(coord, state1, state2, env: ENV):
    """2x2 closure of the mixed <psi1|psi2> environment — the overlap
    counterpart of the 2x2 norm network (reference rdm_overlap.py:8
    ``rdm2x2_id_overlap``: the 2x2 RDM with the identity contracted).
    Built from the generic enlarged corners with the separate bra layer
    (closed corners are matrices: lu [down, right], ru [left, down],
    rd [up, left], ld [up, right])."""
    from .components import corner_ld, corner_lu, corner_rd, corner_ru

    x, y = coord
    site_of = state1.vertexToSite
    sites = state1.sites
    sb = {c: state2.sites[c] for c in state2.sites}
    lu = corner_lu((x, y), sites, site_of, env.C, env.T, sites_bra=sb)
    ru = corner_ru((x + 1, y), sites, site_of, env.C, env.T, sites_bra=sb)
    ld = corner_ld((x, y + 1), sites, site_of, env.C, env.T, sites_bra=sb)
    rd = corner_rd((x + 1, y + 1), sites, site_of, env.C, env.T, sites_bra=sb)
    return jnp.einsum("ab,ac,bc->", lu @ ru, ld, rd)


def transfer_value(state1, state2, env: ENV, coord=(0, 0)):
    """Gauge/normalization-invariant per-site transfer value of the
    mixed network: the 2x1/1x1 closure ratio (one extra column of
    T-T-dl, with the env factors shared)."""
    l2 = complex(closure_2x1(coord, state1, state2, env))
    l1 = complex(closure_1x1(coord, state1, state2, env))
    return l2 / l1


def fidelity_per_site(state1, state2, chi: int, ctm_cfg):
    """|<psi1|psi2>| per site: converge the three environments (12, 11,
    22) and return ``|w12| / sqrt(|w11| |w22|)`` from their invariant
    transfer values.  1 iff the states match up to gauge/normalization
    (reference usage: the ``*_to_dense.py`` cross-consistency scripts)."""
    import numpy as np

    e12, _ = run_overlap(state1, state2, init_env_overlap(state1, state2, chi), ctm_cfg)
    e11, _ = run_overlap(state1, state1, init_env_overlap(state1, state1, chi), ctm_cfg)
    e22, _ = run_overlap(state2, state2, init_env_overlap(state2, state2, chi), ctm_cfg)
    w12 = transfer_value(state1, state2, e12)
    w11 = transfer_value(state1, state1, e11)
    w22 = transfer_value(state2, state2, e22)
    return abs(w12) / np.sqrt(abs(w11) * abs(w22))
