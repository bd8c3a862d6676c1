"""Gradient optimization of abelian (U(1)/Z2/U(1)xU(1)) iPEPS — the
abelian optimization capability (reference
examples/j1j2/abelian/optim_*.py, driven by optim/ad_optim_lbfgs_mod.py
with AD through YASTN's torch backend).

TPU-native architecture: per epoch, a cheap host (numpy) dynamic CTMRG
refreshes the warm environment and the per-sector chi profile; the
L-BFGS closure then evaluates loss+gradient through the FROZEN-structure
device engine (tpeps/ctm/c4v_abelian/frozen.py) — one jitted program
containing the ``lax.while_loop`` fixed point, the implicit Neumann
adjoint, and the RDM energy.  The variational parameters are the state's
block values themselves (AbelianTensor is a pytree, so the generic
:func:`tpeps.optim.driver.optimize_state` consumes them unchanged).
"""

from __future__ import annotations

import jax

from ..ctm.c4v_abelian import ctmrg as ctmrg_c4v
from ..ctm.c4v_abelian import env as env_c4v
from ..ctm.c4v_abelian.frozen import (
    _make_converge_frozen,
    close_structure,
    freeze_from_env,
)
from ..ipeps.ipeps_abelian import IPEPS_ABELIAN, make_c4v_symm_A1_abelian
from .driver import optimize_state


def optimize_c4v_abelian(state, energy_f, cfg, obs_fn=None,
                         best_state_writer=None, opt_resume=None,
                         params0=None, site_of_params=None,
                         symmetrize=True):
    """Optimize a 1-site C4v abelian state.

    :param state: :class:`IPEPS_ABELIAN` with the uniform +1 signature
        (C4v convention); its block values are the variational params
    :param energy_f: ``(state_bp, env_generic) -> scalar`` — evaluated
        on the :func:`as_generic` bipartite view (traceable)
    :param cfg: :class:`tpeps.config.Config`
    :param params0: optional variational parameters replacing the site's
        block values — requires ``site_of_params``
    :param site_of_params: optional traceable ``params -> AbelianTensor``
        (e.g. the U(1)-structured LC ansatz whose parameters are the
        coefficients, tpeps/ipeps/ipeps_abelian_c4v_lc.py)
    :param symmetrize: apply the A1 projector to the site inside the
        loss (disable when ``site_of_params`` is exactly C4v already)
    :return: ``(best_state, history)``
    """
    chi = cfg.main.chi
    sym = state.sym
    ctm_cfg = cfg.ctm
    frozen_keep = []  # pinned after the first epoch unless drift forces refresh

    if site_of_params is None:
        def site_of_params(params):
            return params

    def sym_site(params):
        a = site_of_params(params)
        return make_c4v_symm_A1_abelian(a) if symmetrize else a

    def host_phase(a_np):
        st = IPEPS_ABELIAN(sym, {(0, 0): a_np})
        env, _ = ctmrg_c4v.run(st, env_c4v.init_env(st, chi), ctm_cfg)
        return env

    def loss_ctx_fn(params):
        """Epoch context: host dynamic CTMRG from the current params ->
        warm env (+ refreshed frozen profile on drift)."""
        a_j = sym_site(params)
        a_np = a_j.to_backend("np")
        a_np = a_np * (1.0 / float(a_np.norm()))
        env = host_phase(a_np)
        keep = freeze_from_env(env)
        if not frozen_keep or frozen_keep[0] != keep:
            frozen_keep[:] = [keep]
        C0, T0 = close_structure(
            a_j.to_backend("jnp"), env.C.to_backend("jnp"),
            env.T.to_backend("jnp"), dict(frozen_keep[0]),
        )
        return (C0, T0)

    def loss_fn(params, ctx):
        C0, T0 = ctx
        A = sym_site(params)
        A = A * (1.0 / A.norm())
        fn = _make_converge_frozen(
            frozen_keep[0], ctm_cfg.ctm_max_iter, ctm_cfg.ctm_conv_tol,
            ctm_cfg.ad_decomp_reg, 100, 1.0e-8,
        )
        Cf, Tf = fn(A, C0, T0)
        st = IPEPS_ABELIAN(sym, {(0, 0): A})
        st_bp, eg = env_c4v.as_generic(st, env_c4v.ENV_C4V_ABELIAN(chi, Cf, Tf))
        e = energy_f(st_bp, eg)
        return e.real if hasattr(e, "real") else e

    if params0 is None:
        params0 = state.site((0, 0)).to_backend("jnp")
    best, history = optimize_state(
        params0, loss_fn, cfg=cfg, loss_ctx_fn=loss_ctx_fn, obs_fn=obs_fn,
        best_state_writer=best_state_writer, opt_resume=opt_resume,
    )
    a_best = sym_site(best).to_backend("np")
    a_best = a_best * (1.0 / float(a_best.norm()))
    if isinstance(history, dict):
        history["best_params"] = best
    return IPEPS_ABELIAN(sym, {(0, 0): a_best}), history


def optimize_generic_abelian(state, energy_f, cfg, obs_fn=None,
                             best_state_writer=None, opt_resume=None,
                             params0=None, site_map=None,
                             energy_takes_params=False):
    """Optimize a generic-cell abelian state (e.g. the U(1) bipartite
    2-site ansatz; reference examples/j1j2/abelian/optim_j1j2_u1.py).

    :param state: :class:`IPEPS_ABELIAN` (canonical generic signature);
      the block values of ALL site tensors are the variational params
    :param energy_f: ``(state, env_abelian) -> scalar`` (traceable)
    :param params0: optional variational parameters replacing the
      default (the site dict) — requires ``site_map``
    :param site_map: optional traceable ``params -> {coord: AbelianTensor}``
      for constrained ansatze (e.g. the triangular 1SITE_BP cell where
      the sublattice partner is the charge-conjugate of the single
      parameter tensor, reference examples/triangular/abelian/
      optim_j1j2j4_1s_u1.py generate_BP)
    :param energy_takes_params: call ``energy_f(state, env, params)`` —
      for ansatze whose observables need the elementary tensors (e.g.
      the kagome iPESS: the CTM runs on the fused site, the RDMs
      contract the unfused 7-leg tensor)
    :return: ``(best_state, history)``
    """
    from ..ctm.generic_abelian import ctmrg as ctmrg_g
    from ..ctm.generic_abelian import env as env_g
    from ..ctm.generic_abelian.frozen import (
        close_structure_generic,
        _prof_dict,
        freeze_profiles,
        make_converge_frozen_generic,
    )

    chi = cfg.main.chi
    sym = state.sym
    ctm_cfg = cfg.ctm
    cell = dict(vertexToSite=state.vertexToSite, lX=state.lX, lY=state.lY)
    frozen = []  # [(profiles, converge_fn)] pinned across epochs

    if site_map is None:
        def site_map(params):
            return dict(params)

    def norm_sites(params, np_backend=False):
        out = {}
        for c, a in site_map(params).items():
            if np_backend:
                a = a.to_backend("np")
                out[c] = a * (1.0 / float(a.norm()))
            else:
                out[c] = a * (1.0 / a.norm())
        return out

    def loss_ctx_fn(params):
        sites_np = norm_sites(params, np_backend=True)
        st = IPEPS_ABELIAN(sym, sites_np, **cell)
        env, _ = ctmrg_g.run(st, env_g.init_env(st, chi), ctm_cfg)
        profiles = freeze_profiles(st, env, chi,
                                   svd_reltol=ctm_cfg.projector_svd_reltol,
                                   eps_multiplet=ctm_cfg.projector_eps_multiplet)
        envj = env_g.ENV_ABELIAN(
            chi,
            {k: t.to_backend("jnp") for k, t in env.C.items()},
            {k: t.to_backend("jnp") for k, t in env.T.items()},
        )
        stj = IPEPS_ABELIAN(
            sym,
            {c: a.to_backend("jnp") for c, a in site_map(params).items()},
            **cell)
        envj = close_structure_generic(stj, envj, _prof_dict(profiles),
                                       tuple(tuple(d) for d in
                                             ctm_cfg.ctm_move_sequence))
        if not frozen or frozen[0][0] != profiles:
            fn = make_converge_frozen_generic(
                stj, chi, profiles,
                tuple(tuple(d) for d in ctm_cfg.ctm_move_sequence),
                ctm_cfg.ctm_max_iter, ctm_cfg.ctm_conv_tol,
                ctm_cfg.ad_decomp_reg, 100, 1.0e-8,
            )
            frozen[:] = [(profiles, fn)]
        return (dict(envj.C), dict(envj.T))

    def loss_fn(params, ctx):
        Cs, Ts = ctx
        sites = norm_sites(params)
        Cf, Tf = frozen[0][1](sites, Cs, Ts)
        st = IPEPS_ABELIAN(sym, sites, **cell)
        from ..ctm.generic_abelian.env import ENV_ABELIAN

        envf = ENV_ABELIAN(chi, Cf, Tf)
        e = energy_f(st, envf, params) if energy_takes_params \
            else energy_f(st, envf)
        return e.real if hasattr(e, "real") else e

    if params0 is None:
        params0 = {c: a.to_backend("jnp") for c, a in state.sites.items()}
    else:
        params0 = jax.tree_util.tree_map(
            lambda x: x, params0)  # shallow copy of the pytree
    best, history = optimize_state(
        params0, loss_fn, cfg=cfg, loss_ctx_fn=loss_ctx_fn, obs_fn=obs_fn,
        best_state_writer=best_state_writer, opt_resume=opt_resume,
    )
    sites_best = {}
    for c, a in site_map(best).items():
        a = a.to_backend("np")
        sites_best[c] = a * (1.0 / float(a.norm()))
    if isinstance(history, dict):
        history["best_params"] = best
    return IPEPS_ABELIAN(sym, sites_best, **cell), history
