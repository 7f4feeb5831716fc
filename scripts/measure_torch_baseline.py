#!/usr/bin/env python
"""Measure the reference PyTorch P2RNet inference throughput on CPU.

The reference's pointnet2 extension is CUDA-only (its CPU path asserts:
_ext-src/src/sampling.cpp:34), so this harness injects torch-native CPU
implementations of the three kernels (identical semantics to the CUDA
sources) into ``sys.modules`` BEFORE importing the reference model code, then
times ``forward`` of the unmodified reference modules on random clips.

This is a measurement harness only — it imports the reference from
/root/reference read-only and copies nothing into the framework.

Usage: python scripts/measure_torch_baseline.py  (writes BENCH_NOTES.md line)
"""

import os
import sys
import time
import types

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference")
WORKDIR = "/tmp/refbaseline"


def install_cpu_pointnet2():
    """Torch-CPU pointnet2 ops with the CUDA kernels' exact semantics."""

    def furthest_point_sample(xyz, npoint):
        B, N, _ = xyz.shape
        mag = (xyz ** 2).sum(-1)
        valid = mag > 1e-3
        temp = torch.full((B, N), 1e10)
        idxs = torch.zeros(B, npoint, dtype=torch.int32)
        old = torch.zeros(B, dtype=torch.long)
        for j in range(1, npoint):
            p_old = xyz[torch.arange(B), old][:, None, :]
            d = ((xyz - p_old) ** 2).sum(-1)
            temp = torch.where(valid, torch.minimum(temp, d), temp)
            cand = torch.where(valid, temp, torch.full_like(temp, -1.0))
            old = cand.argmax(1)
            idxs[:, j] = old.int()
        return idxs

    def gather_operation(features, idx):
        # features (B,C,N), idx (B,M) -> (B,C,M)
        idx = idx.long()
        return torch.gather(
            features, 2, idx[:, None, :].expand(-1, features.shape[1], -1)
        )

    def ball_query(radius, nsample, xyz, new_xyz):
        # xyz (B,N,3), new_xyz (B,M,3) -> (B,M,nsample) int32
        d2 = torch.cdist(new_xyz, xyz) ** 2
        N = xyz.shape[1]
        hit = d2 < radius * radius
        key = torch.where(hit, torch.arange(N)[None, None, :].expand_as(hit),
                          torch.full_like(hit, N, dtype=torch.long))
        slots = key.sort(dim=-1).values[:, :, :nsample]
        first = slots[:, :, :1]
        slots = torch.where(slots == N, first, slots)
        slots = torch.where(slots == N, torch.zeros_like(slots), slots)
        return slots.int()

    def grouping_operation(features, idx):
        # features (B,C,N), idx (B,M,S) -> (B,C,M,S)
        B, C, N = features.shape
        _, M, S = idx.shape
        idx = idx.long().reshape(B, 1, M * S).expand(-1, C, -1)
        return torch.gather(features, 2, idx).reshape(B, C, M, S)

    utils_mod = types.ModuleType("pointnet2_ops.pointnet2_utils")
    utils_mod.furthest_point_sample = furthest_point_sample
    utils_mod.gather_operation = gather_operation
    utils_mod.ball_query = ball_query
    utils_mod.grouping_operation = grouping_operation

    class QueryAndGroup(nn.Module):
        def __init__(self, radius, nsample, use_xyz=True, ret_grouped_xyz=False,
                     normalize_xyz=False, sample_uniformly=False, ret_unique_cnt=False):
            super().__init__()
            self.radius, self.nsample, self.use_xyz = radius, nsample, use_xyz
            self.ret_grouped_xyz = ret_grouped_xyz
            self.normalize_xyz = normalize_xyz

        def forward(self, xyz, new_xyz, features=None):
            idx = ball_query(self.radius, self.nsample, xyz, new_xyz)
            grouped_xyz = grouping_operation(xyz.transpose(1, 2).contiguous(), idx)
            grouped_xyz = grouped_xyz - new_xyz.transpose(1, 2).unsqueeze(-1)
            if self.normalize_xyz:
                grouped_xyz = grouped_xyz / self.radius
            if features is not None:
                grouped_features = grouping_operation(features, idx)
                new_features = (
                    torch.cat([grouped_xyz, grouped_features], dim=1)
                    if self.use_xyz
                    else grouped_features
                )
            else:
                new_features = grouped_xyz
            if self.ret_grouped_xyz:
                return new_features, grouped_xyz
            return new_features

    utils_mod.QueryAndGroup = QueryAndGroup

    def build_shared_mlp(mlp_spec, bn=True):
        layers = []
        for i in range(1, len(mlp_spec)):
            layers.append(nn.Conv2d(mlp_spec[i - 1], mlp_spec[i], 1, bias=not bn))
            if bn:
                layers.append(nn.BatchNorm2d(mlp_spec[i]))
            layers.append(nn.ReLU(True))
        return nn.Sequential(*layers)

    class PointnetSAModuleVotes(nn.Module):
        def __init__(self, *, mlp, npoint=None, radius=None, nsample=None, bn=True,
                     use_xyz=True, pooling="max", sigma=None, normalize_xyz=False,
                     sample_uniformly=False, ret_unique_cnt=False):
            super().__init__()
            self.npoint, self.radius, self.nsample = npoint, radius, nsample
            self.pooling = pooling
            self.grouper = QueryAndGroup(
                radius, nsample, use_xyz=use_xyz, ret_grouped_xyz=True,
                normalize_xyz=normalize_xyz,
            )
            spec = list(mlp)
            if use_xyz and len(spec) > 0:
                spec[0] += 3
            self.mlp_module = build_shared_mlp(spec, bn=bn)

        def forward(self, xyz, features=None, inds=None):
            xyz_flipped = xyz.transpose(1, 2).contiguous()
            if inds is None:
                inds = furthest_point_sample(xyz, self.npoint)
            new_xyz = gather_operation(xyz_flipped, inds).transpose(1, 2).contiguous()
            grouped_features, grouped_xyz = self.grouper(xyz, new_xyz, features)
            new_features = self.mlp_module(grouped_features)
            new_features = F.max_pool2d(
                new_features, kernel_size=[1, new_features.size(3)]
            ).squeeze(-1)
            return new_xyz, new_features, inds

    modules_mod = types.ModuleType("pointnet2_ops.pointnet2_modules")
    modules_mod.PointnetSAModuleVotes = PointnetSAModuleVotes

    for name in (
        "external",
        "external.pointnet2_ops_lib",
        "external.pointnet2_ops_lib.pointnet2_ops",
    ):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["external.pointnet2_ops_lib.pointnet2_ops.pointnet2_utils"] = utils_mod
    sys.modules["external.pointnet2_ops_lib.pointnet2_ops.pointnet2_modules"] = modules_mod


class Struct:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def stub_viz_deps():
    """Stub viz-only deps (plyfile/seaborn/trimesh) absent from this image."""
    for name in (
        "plyfile", "seaborn", "trimesh", "trimesh.exchange",
        "trimesh.exchange.binvox", "vtk",
    ):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__getattr__ = lambda attr, _n=name: types.SimpleNamespace()
            sys.modules[name] = mod
    sys.modules["plyfile"].PlyData = object
    sys.modules["plyfile"].PlyElement = object
    sys.modules["trimesh.exchange.binvox"].voxelize_mesh = lambda *a, **k: None
    sys.modules["seaborn"].color_palette = lambda *a, **k: [(0.5, 0.5, 0.5)] * 64


def main():
    os.makedirs(os.path.join(WORKDIR, "datasets"), exist_ok=True)
    os.chdir(WORKDIR)
    sys.path.insert(0, REFERENCE)
    install_cpu_pointnet2()
    stub_viz_deps()
    torch.set_num_threads(os.cpu_count() or 8)

    import net_utils.utils  # noqa: F401 — break the models<->net_utils import cycle
    from configs.dataset_config import Dataset_Config
    from models.p2rnet.modules.stgcn import STGCN
    from models.p2rnet.modules.vote_center import CenterVoteModule
    from models.p2rnet.modules.proposal_net import ProposalNet

    dataset_config = Dataset_Config("virtualhome")
    cfg = Struct(
        config={
            "mode": "train",
            "data": {
                "num_frames": 768, "num_seeds": 512, "seed_sampling": "uniform",
                "num_target": 128, "vote_factor": 1, "cluster_sampling": "vote_fps",
                "num_gaussian": 100,
            },
        },
        dataset_config=dataset_config,
    )

    backbone = STGCN(cfg).eval()
    voting = CenterVoteModule(cfg).eval()
    detection = ProposalNet(cfg).eval()

    @torch.no_grad()
    def forward(input_joints):
        end_points = {}
        end_points = backbone(input_joints, end_points)
        xyz = end_points["seed_skeleton"]
        features = end_points["seed_features"]
        xyz, features = voting(xyz, features)
        features = features / features.norm(p=2, dim=2, keepdim=True)
        end_points["vote_xyz"] = xyz
        end_points["vote_features"] = features
        end_points, _ = detection(xyz, features, end_points, False)
        return end_points

    rng = np.random.RandomState(0)
    best, best_batch = 0.0, 1
    for batch in (1, 4):
        x = torch.from_numpy(
            (rng.randn(batch, 768, 53, 3) * 0.5).astype(np.float32)
        )
        x[..., 0] += torch.linspace(0, 3, 768)[None, :, None]
        forward(x)  # warmup
        n_iter = 3
        t0 = time.perf_counter()
        for _ in range(n_iter):
            forward(x)
        dt = time.perf_counter() - t0
        cps = batch * n_iter / dt
        print(f"batch={batch}: {cps:.3f} clips/s")
        if cps > best:
            best, best_batch = cps, batch
    print(f"torch_cpu_clips_per_sec: {best:.3f} (batch={best_batch})")


if __name__ == "__main__":
    main()
