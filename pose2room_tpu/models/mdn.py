"""Mixture-density (GMM) regression heads with sigmoid mixture weights.

Parity with reference models/p2rnet/modules/mdn.py:17-161:
* learnable global ``mu`` (G, D) initialised from task-specific grids and
  per-gaussian ``log_sigma``;
* input-conditioned mixture weights ``pi = sigmoid(dense(h))`` — SIGMOID, not
  softmax (Bernoulli-style weights, mdn.py:29-32);
* ``predict`` (train path): draw eps~N(0,1) samples, pi-weighted sum over
  gaussians, average over n_samples (mdn.py:49-83);
* ``get_mean`` (deterministic eval): sum_g pi_g * mu_g (mdn.py:85-99);
* ``generate_multi``: Bernoulli-sampled pi per draw (multi-modal sampling).

The backbone is the CategoryEmbeddingMDN 1-layer conv (128->128, cbr).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pose2room_tpu.models.layers import MLP1x1


class MDNHead(nn.Module):
    num_gaussian: int
    out_dim: int
    mu_init: np.ndarray  # (G, D)
    hidden_dim: int = 128
    n_samples: int = 1
    bn_momentum: float = 0.9

    def setup(self):
        self.backbone = MLP1x1(
            [self.hidden_dim], final_plain=False,
            bn_momentum=self.bn_momentum, name="backbone",
        )
        self.pi_head = nn.Dense(self.num_gaussian, name="pi")
        mu_init = np.asarray(self.mu_init, dtype=np.float32)
        assert mu_init.shape == (self.num_gaussian, self.out_dim)
        self.mu = self.param("mu", lambda key: jnp.asarray(mu_init))
        self.log_sigma = self.param(
            "log_sigma", nn.initializers.zeros, (self.num_gaussian, self.out_dim)
        )

    def pi(self, x, train: bool = False):
        """x: (B, P, C) -> mixture weights (B, P, G)."""
        h = self.backbone(x, train=train)
        return jax.nn.sigmoid(self.pi_head(h))

    def _samples(self, pi, rng, n_samples, sample_pi=False):
        """pi: (B,P,G) -> samples (B,P,n_samples,D) = sum_g w_g (mu+eps*sigma)."""
        B, P, G = pi.shape
        sigma = jnp.exp(self.log_sigma)  # (G,D)
        k_eps, k_pi = jax.random.split(rng)
        eps = jax.random.normal(k_eps, (B, P, G, n_samples, self.out_dim))
        draws = self.mu[None, None, :, None, :] + eps * sigma[None, None, :, None, :]
        if sample_pi:
            w = jax.random.bernoulli(k_pi, pi[:, :, :, None], (B, P, G, n_samples))
            w = w.astype(draws.dtype)[..., None]
        else:
            w = pi[:, :, :, None, None]
        return jnp.sum(draws * w, axis=2)  # (B,P,n_samples,D)

    def predict(self, x, rng, train: bool = False, n_samples=None):
        """Train-path prediction: mean over pi-weighted gaussian draws."""
        pi = self.pi(x, train=train)
        n = n_samples or self.n_samples
        samples = self._samples(pi, rng, n)
        return jnp.mean(samples, axis=2)  # (B,P,D)

    def get_mean(self, x, train: bool = False):
        """Deterministic eval: pi-weighted mu (no sampling)."""
        pi = self.pi(x, train=train)
        return jnp.einsum("bpg,gd->bpd", pi, self.mu), pi

    def generate_multi(self, x, rng, n_samples, train: bool = False):
        """Multi-modal sampling: Bernoulli-sampled pi per draw, averaged."""
        pi = self.pi(x, train=train)
        samples = self._samples(pi, rng, n_samples, sample_pi=True)
        return jnp.mean(samples, axis=2), pi


def center_mu_init(num_gaussian):
    """Sphere-shell grid of radius 0.1 (reference proposal_net.py:98-111)."""
    n_bins_theta = int(np.ceil(np.sqrt(num_gaussian / 2)))
    n_bins_phi = 2 * n_bins_theta
    bin_width = np.pi / n_bins_theta
    phi = np.array([bin_width * i - np.pi for i in range(n_bins_phi)])
    theta = np.linspace(0, np.pi, n_bins_theta + 2)[1:-1]
    grids = np.array(np.meshgrid(phi, theta)).reshape(2, -1).T  # (n,2): (phi, theta)
    pts = np.stack(
        [
            0.1 * np.sin(grids[:, 1]) * np.cos(grids[:, 0]),
            0.1 * np.sin(grids[:, 1]) * np.sin(grids[:, 0]),
            0.1 * np.cos(grids[:, 1]),
        ],
        axis=1,
    )
    if num_gaussian < len(pts):
        pts = _fps_downselect(pts, num_gaussian)
    return pts.astype(np.float32)


def size_mu_init(num_gaussian):
    """Log-space grid over [0.05, 3]^3 (reference proposal_net.py:112-117)."""
    bins = int(np.ceil(num_gaussian ** (1 / 3)))
    g = np.linspace(0.05, 3, bins)
    grid = np.log(np.array(np.meshgrid(g, g, g)).reshape(3, -1).T)
    return _fps_downselect(grid, num_gaussian).astype(np.float32)


def heading_mu_init(num_gaussian):
    """Unit circle (sin, cos) bins (reference proposal_net.py:118-122)."""
    bin_width = 2 * np.pi / num_gaussian
    thetas = np.array([bin_width * i - np.pi for i in range(num_gaussian)])
    return np.stack([np.sin(thetas), np.cos(thetas)], axis=1).astype(np.float32)


def _fps_downselect(points, npoint):
    """Deterministic farthest-point downselect of an init grid (host numpy).

    The reference uses a random-start torch FPS here (net_utils/libs.py:163);
    we start from point 0 for reproducibility — mu is a learned parameter so
    only coverage of the grid matters.  Indices are sorted ascending as in
    proposal_net.py:130.
    """
    n = len(points)
    if npoint >= n:
        return points
    dist = np.full(n, np.inf)
    picked = [0]
    for _ in range(npoint - 1):
        d = np.sum((points - points[picked[-1]]) ** 2, axis=1)
        dist = np.minimum(dist, d)
        masked = dist.copy()
        masked[picked] = -np.inf
        picked.append(int(np.argmax(masked)))
    return points[np.sort(picked)]
