"""Parallelism: device mesh, shard_map data parallelism, GSPMD tensor
parallelism for wide models, GSPMD sequence (context) parallelism for
the attention family's long clips, GSPMD expert parallelism for MoE
generators, FSDP (ZeRO-3) state sharding over the data axis, pipeline
parallelism (GPipe and lockstep-1F1B schedules), multi-host (DCN)
initialization."""

from .mesh import DATA_AXIS, batch_sharding, make_mesh, replicated, shard_batch
from .dp import shard_decode, shard_tbptt_train_step, shard_train_step
from .distributed import initialize, make_global_mesh, per_host_batch_size
from .tp import (
    EXPERT_AXIS,
    MODEL_AXIS,
    check_ep_divisibility,
    make_mesh_2d,
    tp_decode,
    tp_shardings,
    tp_specs,
    tp_train_step,
)
from .sp import SEQ_AXIS, make_mesh_3d, sp_decode, sp_train_step
from .fsdp import (
    FSDP_MIN_SIZE,
    fsdp_report,
    fsdp_shardings,
    fsdp_specs,
    fsdp_tbptt_train_step,
    fsdp_train_step,
)
from .ep import ep_decode, ep_train_step, make_mesh_ep
from .pp import (
    STAGE_AXIS,
    make_mesh_pp,
    pp_export_params,
    pp_import_state,
    pp_train_step,
)
from .pp_1f1b import make_pp_1f1b_g_vag, pp_train_step_1f1b

__all__ = [
    "DATA_AXIS",
    "EXPERT_AXIS",
    "MODEL_AXIS",
    "SEQ_AXIS",
    "STAGE_AXIS",
    "make_mesh_pp",
    "make_pp_1f1b_g_vag",
    "pp_export_params",
    "pp_import_state",
    "pp_train_step",
    "pp_train_step_1f1b",
    "check_ep_divisibility",
    "ep_decode",
    "ep_train_step",
    "make_mesh_ep",
    "FSDP_MIN_SIZE",
    "fsdp_report",
    "fsdp_shardings",
    "fsdp_specs",
    "fsdp_tbptt_train_step",
    "fsdp_train_step",
    "make_mesh_3d",
    "sp_decode",
    "sp_train_step",
    "make_mesh_2d",
    "tp_decode",
    "tp_shardings",
    "tp_specs",
    "tp_train_step",
    "batch_sharding",
    "make_mesh",
    "replicated",
    "shard_batch",
    "shard_train_step",
    "shard_tbptt_train_step",
    "shard_decode",
    "initialize",
    "make_global_mesh",
    "per_host_batch_size",
]
