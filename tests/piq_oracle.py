"""Independent torch re-implementation of piq's fsim / vif_p for parity
testing (round-2 verdict item #5).

The reference computes FSIM and VIF-p with the piq package
(/root/reference/Utils/train_test_utils.py:20-21,802-804). piq cannot be
installed here (no egress), but its algorithm is published: piq's fsim is a
torch transliteration of FSIM.m (Zhang et al. 2011, incl. Kovesi's
phasecong2) and its vif_p of vifp_mscale.m (Sheikh & Bovik 2006), with a few
piq-specific conventions that this oracle reproduces deliberately:

  * fsim downsampling uses non-overlapping average pooling
    (F.avg_pool2d(kernel_size=F)), NOT the MATLAB conv-'same'-then-[::F]
    (one-pixel window alignment difference at F>1);
  * Scharr gradients use zero padding (F.conv2d padding=k//2 default
    semantics), not border replication;
  * the Rayleigh noise median uses torch.median's LOWER-median convention
    for even element counts (numpy averages the two middle values);
  * vif_p guards use EPS=1e-8 and the final score is (num+EPS)/(den+EPS);
  * frequency-plane meshgrids normalize odd sizes by (n-1), even by n
    (Kovesi's convention, kept by piq).

This file is written independently against that published algorithm — in
torch, mirroring piq's tensor layout — so that agreement with
ipdm_tpu.metrics.{fsim,vif} (an independent numpy implementation) is
evidence both compute the documented piq algorithm. It is a TEST ORACLE
only; nothing in the package imports it.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F

EPS_VIF = 1e-8


def _gaussian_kernel_t(size: int, sigma: float) -> torch.Tensor:
    coords = torch.arange(size, dtype=torch.float64) - (size - 1) / 2.0
    g = coords ** 2
    g = torch.exp(-(g.unsqueeze(0) + g.unsqueeze(1)) / (2 * sigma ** 2))
    return g / g.sum()


def piq_vif_p(x: np.ndarray, y: np.ndarray, data_range: float = 1.0,
              sigma_n_sq: float = 2.0) -> float:
    """piq.vif_p(x, y, data_range): x is the REFERENCE, y the distorted."""
    xt = torch.from_numpy(np.asarray(x, np.float64))[None, None]
    yt = torch.from_numpy(np.asarray(y, np.float64))[None, None]
    xt = xt / data_range * 255.0
    yt = yt / data_range * 255.0
    num = torch.zeros(())
    den = torch.zeros(())
    for scale in range(4):
        kernel_size = 2 ** (4 - scale) + 1
        kernel = _gaussian_kernel_t(kernel_size, kernel_size / 5.0)[None, None]
        if scale > 0:
            xt = F.conv2d(xt, kernel)[:, :, ::2, ::2]
            yt = F.conv2d(yt, kernel)[:, :, ::2, ::2]
        mu_x, mu_y = F.conv2d(xt, kernel), F.conv2d(yt, kernel)
        sigma_x_sq = F.conv2d(xt * xt, kernel) - mu_x * mu_x
        sigma_y_sq = F.conv2d(yt * yt, kernel) - mu_y * mu_y
        sigma_xy = F.conv2d(xt * yt, kernel) - mu_x * mu_y
        sigma_x_sq = torch.relu(sigma_x_sq)
        sigma_y_sq = torch.relu(sigma_y_sq)

        g = sigma_xy / (sigma_x_sq + EPS_VIF)
        sigma_v_sq = sigma_y_sq - g * sigma_xy

        g = torch.where(sigma_x_sq >= EPS_VIF, g, torch.zeros_like(g))
        sigma_v_sq = torch.where(sigma_x_sq >= EPS_VIF, sigma_v_sq,
                                 sigma_y_sq)
        sigma_x_sq = torch.where(sigma_x_sq >= EPS_VIF, sigma_x_sq,
                                 torch.zeros_like(sigma_x_sq))
        g = torch.where(sigma_y_sq >= EPS_VIF, g, torch.zeros_like(g))
        sigma_v_sq = torch.where(sigma_y_sq >= EPS_VIF, sigma_v_sq,
                                 torch.zeros_like(sigma_v_sq))
        sigma_v_sq = torch.where(g >= 0, sigma_v_sq, sigma_y_sq)
        g = torch.relu(g)
        sigma_v_sq = torch.where(sigma_v_sq > EPS_VIF, sigma_v_sq,
                                 torch.full_like(sigma_v_sq, EPS_VIF))

        num = num + torch.sum(torch.log10(
            1.0 + g ** 2 * sigma_x_sq / (sigma_v_sq + sigma_n_sq)))
        den = den + torch.sum(torch.log10(1.0 + sigma_x_sq / sigma_n_sq))
    return float((num + EPS_VIF) / (den + EPS_VIF))


# --- fsim ------------------------------------------------------------------

def _meshgrid_t(rows: int, cols: int):
    """Kovesi/piq frequency-plane grid: odd sizes normalize by (n-1)."""
    if rows % 2:
        gy = torch.arange(-(rows - 1) / 2, rows / 2,
                          dtype=torch.float64) / (rows - 1)
    else:
        gy = torch.arange(-rows / 2, rows / 2, dtype=torch.float64) / rows
    if cols % 2:
        gx = torch.arange(-(cols - 1) / 2, cols / 2,
                          dtype=torch.float64) / (cols - 1)
    else:
        gx = torch.arange(-cols / 2, cols / 2, dtype=torch.float64) / cols
    # ij indexing: first axis = rows
    return torch.meshgrid(gy, gx, indexing="ij")


def _lowpass_t(rows: int, cols: int, cutoff: float = 0.45,
               n: int = 15) -> torch.Tensor:
    gy, gx = _meshgrid_t(rows, cols)
    radius = torch.sqrt(gx ** 2 + gy ** 2)
    return torch.fft.ifftshift(1.0 / (1.0 + (radius / cutoff) ** (2 * n)))


def _phase_congruency_t(im: torch.Tensor, scales: int = 4,
                        orientations: int = 4, min_length: float = 6.0,
                        mult: float = 2.0, sigma_f: float = 0.55,
                        delta_theta: float = 1.2,
                        k: float = 2.0) -> torch.Tensor:
    rows, cols = im.shape
    imfft = torch.fft.fft2(im)

    gy, gx = _meshgrid_t(rows, cols)
    radius = torch.fft.ifftshift(torch.sqrt(gx ** 2 + gy ** 2))
    theta = torch.fft.ifftshift(torch.atan2(-gy, gx))
    radius[0, 0] = 1.0
    sin_t, cos_t = torch.sin(theta), torch.cos(theta)
    lp = _lowpass_t(rows, cols)

    log_gabor = []
    for s in range(scales):
        wavelength = min_length * mult ** s
        fo = 1.0 / wavelength
        g = torch.exp(-(torch.log(radius / fo)) ** 2
                      / (2 * math.log(sigma_f) ** 2)) * lp
        g[0, 0] = 0.0
        log_gabor.append(g)

    theta_sigma = math.pi / (orientations * delta_theta)
    energy_all = torch.zeros((rows, cols), dtype=torch.float64)
    an_all = torch.zeros((rows, cols), dtype=torch.float64)

    for o in range(orientations):
        angl = o * math.pi / orientations
        ds = sin_t * math.cos(angl) - cos_t * math.sin(angl)
        dc = cos_t * math.cos(angl) + sin_t * math.sin(angl)
        dtheta = torch.abs(torch.atan2(ds, dc))
        spread = torch.exp(-dtheta ** 2 / (2 * theta_sigma ** 2))

        eo, ifft_filters = [], []
        sum_e = torch.zeros((rows, cols), dtype=torch.float64)
        sum_o = torch.zeros((rows, cols), dtype=torch.float64)
        sum_an = torch.zeros((rows, cols), dtype=torch.float64)
        em_n = torch.zeros((), dtype=torch.float64)
        for s in range(scales):
            filt = log_gabor[s] * spread
            ifft_filters.append(torch.real(torch.fft.ifft2(filt))
                                * math.sqrt(rows * cols))
            e = torch.fft.ifft2(imfft * filt)
            eo.append(e)
            sum_an = sum_an + torch.abs(e)
            sum_e = sum_e + torch.real(e)
            sum_o = sum_o + torch.imag(e)
            if s == 0:
                em_n = torch.sum(filt ** 2)

        x_energy = torch.sqrt(sum_e ** 2 + sum_o ** 2) + 1e-4
        mean_e, mean_o = sum_e / x_energy, sum_o / x_energy
        energy = torch.zeros((rows, cols), dtype=torch.float64)
        for s in range(scales):
            e_r, e_i = torch.real(eo[s]), torch.imag(eo[s])
            energy = energy + (e_r * mean_e + e_i * mean_o
                               - torch.abs(e_r * mean_o - e_i * mean_e))

        # Rayleigh noise threshold; torch lower-median for even counts
        abs0_sq = (torch.abs(eo[0]) ** 2).reshape(-1)
        median_e2n = torch.median(abs0_sq)
        mean_e2n = -median_e2n / math.log(0.5)
        noise_power = mean_e2n / em_n
        est_sum_an2 = torch.zeros((rows, cols), dtype=torch.float64)
        for s in range(scales):
            est_sum_an2 = est_sum_an2 + ifft_filters[s] ** 2
        est_sum_aiaj = torch.zeros((rows, cols), dtype=torch.float64)
        for si in range(scales - 1):
            for sj in range(si + 1, scales):
                est_sum_aiaj = (est_sum_aiaj
                                + ifft_filters[si] * ifft_filters[sj])
        noise_energy2 = (2 * noise_power * torch.sum(est_sum_an2)
                         + 4 * noise_power * torch.sum(est_sum_aiaj))
        tau = torch.sqrt(noise_energy2 / 2)
        noise_energy = tau * math.sqrt(math.pi / 2)
        noise_sigma = torch.sqrt((2 - math.pi / 2) * tau ** 2)
        T = (noise_energy + k * noise_sigma) / 1.7
        energy = torch.clamp(energy - T, min=0.0)

        energy_all = energy_all + energy
        an_all = an_all + sum_an

    return energy_all / an_all


_SCHARR = torch.tensor([[-3.0, 0.0, 3.0],
                        [-10.0, 0.0, 10.0],
                        [-3.0, 0.0, 3.0]], dtype=torch.float64) / 16.0


def piq_fsim(x: np.ndarray, y: np.ndarray, data_range: float = 1.0,
             t1: float = 0.85, t2: float = 160.0) -> float:
    """piq.fsim(x, y, data_range, chromatic=False) for 2-D grayscale."""
    xt = torch.from_numpy(np.asarray(x, np.float64))[None, None]
    yt = torch.from_numpy(np.asarray(y, np.float64))[None, None]
    xt = xt / data_range * 255.0
    yt = yt / data_range * 255.0
    rows, cols = x.shape
    f = max(1, round(min(rows, cols) / 256))
    if f > 1:
        xt = F.avg_pool2d(xt, kernel_size=f)
        yt = F.avg_pool2d(yt, kernel_size=f)

    pc1 = _phase_congruency_t(xt[0, 0])
    pc2 = _phase_congruency_t(yt[0, 0])

    kernels = torch.stack([_SCHARR, _SCHARR.t()])[:, None]
    g1 = torch.sqrt(torch.sum(
        F.conv2d(xt, kernels, padding=1) ** 2, dim=1))[0]
    g2 = torch.sqrt(torch.sum(
        F.conv2d(yt, kernels, padding=1) ** 2, dim=1))[0]

    pc_sim = (2 * pc1 * pc2 + t1) / (pc1 ** 2 + pc2 ** 2 + t1)
    g_sim = (2 * g1 * g2 + t2) / (g1 ** 2 + g2 ** 2 + t2)
    s = g_sim * pc_sim
    pcm = torch.maximum(pc1, pc2)
    return float(torch.sum(s * pcm) / torch.sum(pcm))
