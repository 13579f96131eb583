"""Framework configuration.

``Args`` mirrors the reference's config struct field-for-field
(/root/reference/src/MeshGraphNets.jl:35-57) plus the TPU-specific knobs the
reference lacks, and fixes its documented gaps: ``batchsize`` is actually
implemented (data parallelism), the inflow node types are configurable (the
reference hardcodes ``node_type == 1`` at /root/reference/src/MeshGraphNets.jl:593),
and RNG seeds are exposed (the reference pins ``seed!(1234)``,
/root/reference/src/dataset.jl:90).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

from mgn_tpu.train.strategies import DerivativeTraining, TrainingStrategy

__all__ = ["Args"]


@dataclasses.dataclass
class Args:
    # --- model (reference defaults) ---
    mps: int = 15
    layer_size: int = 128
    hidden_layers: int = 2

    # --- training schedule ---
    batchsize: int = 1  # implemented via data parallelism (reference: accepted but unused)
    # total optimizer steps = steps * epochs, exactly the reference's loop
    # bound (/root/reference/src/MeshGraphNets.jl:348 `args.steps * args.epochs`)
    epochs: int = 1
    steps: int = 10_000_000
    checkpoint: int = 10_000
    norm_steps: int = 1000  # steps of normalizer warmup before optimizer updates
    max_norm_steps: float = 10e6  # online-normalizer accumulation cap

    # --- node-type semantics ---
    types_updated: Tuple[int, ...] = (0, 5)
    types_noisy: Tuple[int, ...] = (0,)
    types_inflow: Tuple[int, ...] = (1,)  # configurable (hardcoded in reference)

    # --- strategy / evaluation ---
    training_strategy: TrainingStrategy = dataclasses.field(
        default_factory=DerivativeTraining
    )
    num_rollouts: int = 10
    use_valid: bool = True
    solver_valid: str = "tsit5_adaptive"  # any FIXED_METHODS name or 'tsit5_adaptive'
    solver_valid_dt: Optional[float] = None
    reset_valid: bool = False
    rtol: float = 1e-4  # adaptive-solver tolerances (reference: solargs)
    atol: float = 1e-6
    # accepted for Args parity: the reference only uses this to pick cells for
    # its (optional) validation plots (/root/reference/src/MeshGraphNets.jl:235);
    # plotting here is downstream of the exported trajectories.h5
    cell_idxs: Tuple[int, ...] = (0,)

    # --- reproducibility ---
    seed: int = 1234

    # --- TPU-native knobs (no reference equivalent) ---
    compute_dtype: str = "float32"  # 'bfloat16' for MXU speed
    aggregation_backend: Optional[str] = None  # None='auto' | 'xla' | 'pallas'
    unroll: bool = False  # unroll processor rounds (faster on TPU, bigger HLO)
    # permute nodes into spatial sweep order at prep time: narrow index bands
    # enable the fused round kernel (ops/fused.py) and banded gathers;
    # per-node outputs are un-permuted before export.
    # None = auto: on for TPU backends, off elsewhere (same for the two
    # fused knobs; when the per-round residual windows don't fit VMEM —
    # f32 at cylinder size, any dtype at airfoil size — the kernels stream
    # them from HBM automatically, so the auto default holds at any size)
    spatial_reorder: Optional[bool] = None
    fused: Optional[bool] = None  # fused round kernel for the processor
    fused_backward: Optional[bool] = None  # native reverse-round backward
    node_bucket_multiple: int = 128
    edge_bucket_multiple: int = 512  # 512-edge chunks for the fused kernel
    data_axis: str = "data"  # device-mesh axis for trajectory batching
    graph_axis: str = "graph"  # device-mesh axis for edge partitioning
    # shard each trajectory's mesh over this many devices (power of two);
    # together with batchsize this selects the (data, graph) device mesh and
    # routes train_network through the SPMD halo-exchange step
    graph_parallel: int = 1
    # processor rounds per halo exchange under graph parallelism (k-deep
    # ghost zones, parallel/partition.add_deep_halo_plan).  None = auto
    # (= mps: ONE exchange per forward, whole processor in one fused-kernel
    # call per shard — the per-round path cost 2.5x the unsharded step at
    # mesh (1,1), benchmarks/results/SPMD_r03.json); 0 = classic per-round
    # halo exchange; k must divide mps.  Redundant ghost compute grows with
    # k (depth k single-segment, 2k-1 multi-segment) — tune down on meshes
    # where the k-ring rivals the part size.
    halo_rounds: Optional[int] = None
    # telescoped deep segments: number of shrinking stages per deep segment
    # (partition.TelescopeStage; None/1 = classic single-table segment).
    # Rounds after each stage run on progressively smaller nested ghost
    # tables — ~half the redundant ghost compute at zero extra communication
    # (round-5 scaling item; measured stage overhead in SPMD_r05*.json).
    telescope_stages: Optional[int] = None
    # cloth family: static world-edge buffer size.  None = auto from the
    # meta.json ``world_edges`` contract (capacity_per_node x padded nodes,
    # api_cloth._world_capacity); under graph parallelism each shard keeps
    # the FULL capacity (contact edges cluster spatially — a P-divided
    # budget can silently drop edges one shard over, round-4 advisor
    # finding 1)
    world_capacity: Optional[int] = None
    prefetch: int = 2
    # cap on DEVICE-resident cached trajectory data (prepared field stacks /
    # partitioned templates), LRU-evicted beyond this.  Bounds HBM use on
    # real-size datasets (CylinderFlow: 1000 trajectories ~ 9 GB of velocity
    # alone) — the raw host-side Trajectory cache is separate (numpy RAM,
    # mirroring the reference's in-memory caching at
    # /root/reference/src/dataset.jl:556-583)
    cache_bytes: int = 4 << 30

    # --- logging ---
    wandb_logger: Any = None  # optional; structured JSONL metrics are native
    log_every: int = 100

    def model_dims(self) -> dict:
        return dict(latent_size=self.layer_size, hidden_layers=self.hidden_layers,
                    message_passing_steps=self.mps)

    def resolve_auto(self) -> "Args":
        """Resolve the None (=auto) TPU-path knobs against the live backend."""
        import dataclasses as _dc

        import jax

        on_tpu = jax.default_backend() == "tpu"
        return _dc.replace(
            self,
            spatial_reorder=(on_tpu if self.spatial_reorder is None
                             else self.spatial_reorder),
            fused=on_tpu if self.fused is None else self.fused,
            fused_backward=(on_tpu if self.fused_backward is None
                            else self.fused_backward),
            halo_rounds=(self.mps if self.halo_rounds is None
                         else self.halo_rounds),
        )
