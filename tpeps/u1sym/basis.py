"""Programmatic generation of C4v- and U(1)-classified elementary-tensor
bases for linear-combination iPEPS ansaetze.

Counterpart of reference u1sym/basis.py:26-248 and the shipped
classified-basis data files ``u1sym/*.txt`` (which we do NOT ship —
the basis is generated from the same defining data: C4v orbits of index
tuples + a U(1) charge filter).

Conventions: on-site tensor ``a[s,u,l,d,r]``; an A_1 basis element is
the indicator over one C4v orbit of aux-index 4-tuples at fixed
physical index; U(1) filter keeps orbits whose charges sum to the total.
"""

from __future__ import annotations

from itertools import product

import numpy as np
import jax.numpy as jnp


def _perm(l, p):
    return tuple(l[x] for x in p)


def _gen_A1(seed):
    """One application of the C4v generators to an aux-index 4-tuple
    (reference u1sym/basis.py:73-82): l-r / u-d reflections, +-90 deg
    rotations in the (u,l,d,r) ordering."""
    return set(_perm(seed, p) for p in [(0, 3, 2, 1), (2, 1, 0, 3), (3, 0, 1, 2), (1, 2, 3, 0)])


def gen_c4v_orbit(seed):
    """Full C4v orbit of a 4-tuple (reference u1sym/basis.py:85-97)."""
    perms = _gen_A1(seed)
    if seed not in perms:
        for p in list(perms):
            perms |= _gen_A1(p)
    return perms


def gen_orbits_at_D(D):
    """All orbits whose maximal index value is exactly D-1
    (reference u1sym/basis.py:100-108)."""
    out = []
    work = list(product(*([range(D)] * 3 + [(D - 1,)])))
    while work:
        out.append(gen_c4v_orbit(work[0]))
        work = [w for w in work if w not in out[-1]]
    return out


def get_u1_filter(u1_charges, total_charge=0, dim_loc_H=2):
    """Charge filter over (s, u, l, d, r) index tuples: ``u1_charges``
    lists d physical charges followed by D aux charges
    (reference u1sym/basis.py:159-180)."""
    def f(inds):
        return (u1_charges[inds[0]]
                + sum(u1_charges[dim_loc_H + i] for i in inds[1:])) == total_charge

    return f


def get_basis_upto_D(max_D, dim_loc_H=2, f_filter=None):
    """All A_1 orbit-indicator basis tensors with aux indices < max_D,
    ordered by growing maximal index then physical index
    (reference u1sym/basis.py:115-157)."""
    per_d = [[] for _ in range(dim_loc_H)]
    for D in range(1, max_D + 1):
        for d in range(dim_loc_H):
            for t_set in gen_orbits_at_D(D):
                if f_filter is not None and not f_filter((d,) + next(iter(t_set))):
                    continue
                t = np.zeros((dim_loc_H,) + (max_D,) * 4)
                for idx in t_set:
                    t[(d,) + idx] = 1.0
                per_d[d].append(t)
    return sum(per_d, [])


def generate_a_basis(d, D, u1_charges=None, u1_total_charge=0):
    """Stacked basis [n_basis, d, D, D, D, D] of C4v-A_1 (optionally
    U(1)-filtered) elementary tensors (reference u1sym/basis.py:26-66)."""
    if u1_charges is not None:
        assert len(u1_charges) == d + D, (
            f"U(1) charges {u1_charges} incompatible with d={d}, D={D}")
        basis = get_basis_upto_D(
            D, dim_loc_H=d,
            f_filter=get_u1_filter(u1_charges, u1_total_charge, d))
        assert basis, "empty basis for the selected charges"
        return jnp.asarray(np.stack(basis))
    basis = get_basis_upto_D(D, dim_loc_H=d)
    return jnp.asarray(np.stack(basis))


def rebase_params(params, basis0, basis, rng_noise=0.0, D=None, rng=None):
    """Map coefficients given in ``basis0`` onto (a superset) ``basis``
    (reference u1sym/basis.py:183-225): orbit indicators are mutually
    orthogonal, so the mapping is a permutation + rescale."""
    basis0 = np.asarray(basis0)
    basis = np.asarray(basis)
    params = np.asarray(params)
    if D is None:
        assert len(set(basis0.shape[-4:])) == 1, "basis0 not C4v-symmetric"
        D = basis0.shape[-1]
    overlaps = np.einsum(
        "xpuldr,ypuldr->xy", basis0, basis[(...,) + (slice(D),) * 4])
    perm = overlaps.nonzero()
    assert len(perm[0]) == basis0.shape[0], \
        "target basis is not a subset of the reference basis"
    params = params * np.sum(
        basis0.reshape(basis0.shape[0], -1) ** 2, axis=1) / overlaps[perm]
    if rng is None:
        rng = np.random.RandomState(0)
    out = rng_noise * (rng.rand(basis.shape[0]) - 0.5)
    out[perm[1]] = params
    return out
