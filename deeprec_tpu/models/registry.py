"""Model zoo registry: name -> (columns_fn, module_ctor, apply_fn_ctor,
loss_fn, data_ctor).  Mirrors the reference's ``modelzoo/<M>/train.py``
per-model entry points behind one uniform interface (used by the bench
harness and the zoo tests)."""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple

from deeprec_tpu.data.behavior import SyntheticBehavior
from deeprec_tpu.data.criteo import SyntheticCriteo, SyntheticMultiTask
from deeprec_tpu.models import (bst, deepfm, dien, din, dlrm, dssm,
                                multitask, wdl)
from deeprec_tpu.train.losses import bce_with_logits


class ZooEntry(NamedTuple):
    columns: Callable[..., list]
    make_module: Callable[..., Any]
    make_apply: Callable[[Any, Any], Callable]
    loss: Callable
    make_data: Callable[..., Any]


def _bce(out, batch):
    return bce_with_logits(out, batch["label"])


ZOO: Dict[str, ZooEntry] = {
    "wdl": ZooEntry(wdl.criteo_columns, wdl.WDL, wdl.apply_fn, _bce,
                    SyntheticCriteo),
    "deepfm": ZooEntry(deepfm.criteo_columns, deepfm.DeepFM,
                       deepfm.apply_fn, _bce, SyntheticCriteo),
    "dlrm": ZooEntry(dlrm.criteo_columns, dlrm.DLRM, dlrm.apply_fn, _bce,
                     SyntheticCriteo),
    "din": ZooEntry(din.behavior_columns, din.DIN, din.apply_fn, _bce,
                    SyntheticBehavior),
    "dien": ZooEntry(dien.behavior_columns, dien.DIEN, dien.apply_fn,
                     dien.dien_loss, SyntheticBehavior),
    "bst": ZooEntry(bst.behavior_columns, bst.BST, bst.apply_fn, _bce,
                    SyntheticBehavior),
    "dssm": ZooEntry(dssm.behavior_columns, dssm.DSSM, dssm.apply_fn,
                     dssm.dssm_loss, SyntheticBehavior),
    "esmm": ZooEntry(multitask.criteo_columns, multitask.ESMM,
                     multitask.apply_fn, multitask.esmm_loss,
                     SyntheticMultiTask),
    "mmoe": ZooEntry(multitask.criteo_columns, multitask.MMoE,
                     multitask.apply_fn, multitask.multitask_loss,
                     SyntheticMultiTask),
    "dbmtl": ZooEntry(multitask.criteo_columns, multitask.DBMTL,
                      multitask.apply_fn, multitask.multitask_loss,
                      SyntheticMultiTask),
    "simple_multitask": ZooEntry(
        multitask.criteo_columns, multitask.SimpleMultiTask,
        multitask.apply_fn, multitask.multitask_loss, SyntheticMultiTask),
}
