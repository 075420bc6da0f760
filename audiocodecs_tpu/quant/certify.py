"""Sound token-safety certificates for reduced-precision encoders.

The exact (HIGHEST-precision, 6-pass) conv path is the token-parity
reference; the 3-pass ``ACX_CONV_PRECISION=high`` path is ~30% faster but
perturbs the pre-quantizer latents by a small δ per frame, which can flip
argmin-marginal tokens (measured ~2·10⁻⁴ of frames on random weights —
BENCH_NOTES). This module turns that empirical rate into a PER-FRAME PROOF:

For an RVQ stage with exact residual r, nearest codeword e₁, and any
competitor e_j with squared-distance margin m_j = d²(r,e_j) − d²(r,e₁) ≥ 0:
perturbing the latent by δ changes the margin by exactly 2·δ·(e₁−e_j)
(the ‖δ‖² terms cancel), so a flip to j requires

    ‖δ‖ ≥ m_j / (2‖e₁−e_j‖).

A frame is **certified** at the stage iff
``2‖δ‖‖e₁−e_j‖ + rounding_slack < m_j`` for every competitor j.
Certification composes across RVQ stages: if every earlier stage of the
frame is certified (same token ⇒ the same codeword is subtracted from both
paths), the residual perturbation entering the next stage is still the same
δ, so the per-stage tests use one δ. The certificate is sound, not tight —
an uncertified frame may still agree (check ``equal``); a certified frame
PROVABLY agrees.

``rounding_slack`` covers the REAL quantizer's finite precision: the
encoder computes scores ``2·r·c_j − ‖c_j‖²`` in float32 (HIGHEST matmul),
so frames with f64 margins below the f32 dot-product forward-error bound
could still flip regardless of δ. Per frame and codeword the slack is
``SAFETY · γ_H · (2·Σ|r_i||c_ji| + Σc_ji²)`` with ``γ_H = H·u/(1−H·u)``,
``u = 2⁻²⁴`` (classic Higham dot-product bound) and a ×4 SAFETY factor for
the TPU's 6-pass-bf16 f32 emulation; the flip test deflates each margin by
``slack₁ + slack_j``. Without this term, adversarial near-Voronoi-boundary
frames (margins ~1e-8) can be "certified" yet disagree under f32.
"""

from __future__ import annotations

import numpy as np

__all__ = ["certify_rvq_tokens", "certify_dac_tokens", "certify_mimi_tokens"]

# f32 unit roundoff and dot-product forward-error coefficient
_U32 = 2.0 ** -24
_SAFETY = 4.0


def _gamma(n: int) -> float:
    return n * _U32 / (1.0 - n * _U32)


def certify_rvq_tokens(z_exact, z_fast, codebooks,
                       num_codebooks: int | None = None, extra_delta=None):
    """``z_exact``/``z_fast``: [B, N, H] latents from the exact and
    reduced-precision encoders; ``codebooks``: [K, C, H].

    Returns ``(certified [B, N] bool, equal [B, N] bool, delta [B, N])``:
    ``certified`` frames provably produce identical tokens at every stage;
    ``equal`` is the observed agreement (⊇ certified); ``delta`` = ‖δ‖.

    The analysis itself runs in HOST float64 numpy — on TPU, device-default
    bf16 matmuls would corrupt the very margins the proof relies on (a
    measured failure mode: "certified" frames disagreeing because the
    certificate's own distance computation was low-precision).
    """
    z_exact = np.asarray(z_exact, np.float64)
    z_fast = np.asarray(z_fast, np.float64)
    codebooks = np.asarray(codebooks, np.float64)
    K = codebooks.shape[0] if num_codebooks is None else num_codebooks
    delta = np.linalg.norm(z_exact - z_fast, axis=-1)  # [B, N]
    if extra_delta is not None:  # e.g. upstream-projection f32 rounding
        delta = delta + np.asarray(extra_delta, np.float64)
    residual = z_exact
    certified = np.ones(z_exact.shape[:2], bool)
    equal = np.ones(z_exact.shape[:2], bool)
    res_fast = z_fast
    for k in range(K):
        cb = codebooks[k]  # [C, H]
        cb_sq = np.sum(cb**2, -1)
        # exact-path distances and margins
        d2 = (np.sum(residual**2, -1, keepdims=True)
              - 2.0 * np.einsum("bnh,ch->bnc", residual, cb)
              + cb_sq[None, None])  # [B, N, C]
        i1 = np.argmin(d2, axis=-1)  # [B, N]
        m = d2 - np.take_along_axis(d2, i1[..., None], axis=-1)  # margins
        # pairwise codeword distances, row of the winner per frame
        g2 = cb_sq[:, None] - 2.0 * cb @ cb.T + cb_sq[None, :]  # [C, C]
        dist = 2.0 * np.sqrt(np.maximum(g2[i1], 1e-24))  # 2‖e₁−e_j‖
        # f32 score-rounding slack (see module docstring): per codeword j,
        # SAFETY·γ_H·(2 Σ|r||c_j| + Σc_j²); margin must clear both slacks
        gam = _SAFETY * _gamma(cb.shape[-1])
        absdot = np.einsum("bnh,ch->bnc", np.abs(residual), np.abs(cb))
        slack = gam * (2.0 * absdot + np.sum(cb**2, -1)[None, None])
        slack1 = np.take_along_axis(slack, i1[..., None], axis=-1)
        ok = (delta[..., None] * dist + slack + slack1
              < np.maximum(m, 0.0))
        ok |= np.arange(cb.shape[0])[None, None] == i1[..., None]
        certified &= np.all(ok, axis=-1)
        # observed agreement on the fast path (same f64 quantizer math)
        d2f = (np.sum(res_fast**2, -1, keepdims=True)
               - 2.0 * np.einsum("bnh,ch->bnc", res_fast, cb)
               + cb_sq[None, None])
        i1_fast = np.argmin(d2f, axis=-1)
        equal &= i1_fast == i1
        residual = residual - cb[i1]
        # fast path subtracts ITS OWN codeword (as the real encoder would)
        res_fast = res_fast - cb[i1_fast]
    return certified, equal, delta


def certify_dac_tokens(z_exact, z_fast, quantizers,
                       num_codebooks: int | None = None):
    """DAC variant (projected cosine RVQ, ``models/dac.py:137-159``).

    Stage scores are ``unit(W_in·r + b) · unit(c_j)``. With previous-stage
    tokens equal, the fast residual is ``r + δ`` with the SAME δ at every
    stage, so the unit-projection perturbation ``Δu`` is computable exactly
    per frame; a flip to competitor j requires
    ``Δu·(ĉ₁−ĉ_j) ≤ −m_j`` ⇒ ``‖Δu‖ ≥ m_j / ‖ĉ₁−ĉ_j‖``.
    Returns ``(certified [B, N], equal [B, N], delta [B, N])``.
    """
    z_exact = np.asarray(z_exact, np.float64)
    z_fast = np.asarray(z_fast, np.float64)
    K = len(quantizers) if num_codebooks is None else num_codebooks
    delta = np.linalg.norm(z_exact - z_fast, axis=-1)
    certified = np.ones(z_exact.shape[:2], bool)
    equal = np.ones(z_exact.shape[:2], bool)
    r_e, r_f = z_exact, z_fast

    def unit(v):
        return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True),
                              1e-24)

    for k in range(K):
        q = quantizers[k]
        w_in = np.asarray(q["in_proj"]["w"], np.float64)[0]  # [H, D] (k=1)
        b_in = np.asarray(q["in_proj"]["b"], np.float64)
        cb = unit(np.asarray(q["codebook"], np.float64))  # [C, D] unit rows
        z_e_raw = r_e @ w_in + b_in
        u_e = unit(z_e_raw)  # [B, N, D]
        u_f = unit(r_f @ w_in + b_in)
        du = np.linalg.norm(u_f - u_e, axis=-1)  # [B, N]
        # f32 rounding of the real in_proj conv: elementwise |z| error
        # ≤ γ_H · (|r|·|W| + |b|), propagated through the normalization
        # (‖Δu‖ ≤ 2‖Δz‖/‖z‖)
        gam_h = _SAFETY * _gamma(w_in.shape[0])
        zabs = np.abs(r_e) @ np.abs(w_in) + np.abs(b_in)
        znorm = np.linalg.norm(z_e_raw, axis=-1)
        du_tot = du + 2.0 * gam_h * np.linalg.norm(zabs, axis=-1) \
            / np.maximum(znorm, 1e-24)
        s = np.einsum("bnd,cd->bnc", u_e, cb)
        i1 = np.argmax(s, axis=-1)
        m = np.take_along_axis(s, i1[..., None], axis=-1) - s  # ≥ 0
        # ‖ĉ₁−ĉ_j‖ per frame: row i1 of the pairwise unit-codeword distances
        g = np.sqrt(np.maximum(
            2.0 - 2.0 * cb @ cb.T, 1e-24))  # [C, C]
        # f32 score-dot slack + normalization ulps on both operands
        gam_d = _SAFETY * _gamma(cb.shape[-1])
        score_slack = (gam_d * np.einsum("bnd,cd->bnc", np.abs(u_e),
                                         np.abs(cb))
                       + _SAFETY * (cb.shape[-1] + 2) * _U32)
        slack1 = np.take_along_axis(score_slack, i1[..., None], axis=-1)
        ok = (du_tot[..., None] * g[i1] + score_slack + slack1
              < np.maximum(m, 0.0))
        ok |= np.arange(cb.shape[0])[None, None] == i1[..., None]
        certified &= np.all(ok, axis=-1)
        i1_f = np.argmax(np.einsum("bnd,cd->bnc", u_f, cb), axis=-1)
        equal &= i1_f == i1
        w_out = np.asarray(q["out_proj"]["w"], np.float64)[0]
        b_out = np.asarray(q["out_proj"]["b"], np.float64)
        cb_raw = np.asarray(q["codebook"], np.float64)
        r_e = r_e - (cb_raw[i1] @ w_out + b_out)
        r_f = r_f - (cb_raw[i1_f] @ w_out + b_out)
    return certified, equal, delta


def certify_mimi_tokens(emb_exact, emb_fast, quantizer,
                        num_codebooks: int, num_semantic: int = 1):
    """Mimi variant (split RVQ, ``models/mimi.py:158-170``): two
    independent branches, each ``z = emb · in_proj`` then plain RVQ — the
    projected perturbations are computed exactly per branch and the
    euclidean certificate applies; the frame certificate is the AND.
    Returns ``(certified [B, N], equal [B, N], delta [B, N])``.
    """
    emb_exact = np.asarray(emb_exact, np.float64)
    emb_fast = np.asarray(emb_fast, np.float64)
    delta = np.linalg.norm(emb_exact - emb_fast, axis=-1)

    def branch(p, n):
        proj = np.asarray(p["in_proj"], np.float64)
        # the real branch projection runs in f32: fold its per-frame
        # forward-error bound into the perturbation budget (both paths)
        extra = 2.0 * _SAFETY * _gamma(proj.shape[0]) * np.linalg.norm(
            np.abs(emb_exact) @ np.abs(proj), axis=-1)
        return certify_rvq_tokens(emb_exact @ proj, emb_fast @ proj,
                                  p["codebooks"], n, extra_delta=extra)

    cert, equal, _ = branch(quantizer["semantic"], num_semantic)
    if num_codebooks > num_semantic:
        c2, e2, _ = branch(quantizer["acoustic"],
                           num_codebooks - num_semantic)
        cert, equal = cert & c2, equal & e2
    return cert, equal, delta
