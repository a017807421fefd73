"""Experiment logging: TensorBoard scalars + optional W&B (reference
utils/wandb_logging + train.py:831-840 TensorBoard wiring).

TensorBoard uses torch.utils.tensorboard (torch-cpu is in the image); W&B is
gated on the package being importable and WANDB_DISABLED not set — absent in
this environment, the logger degrades to a no-op with the same interface.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, Optional

logger = logging.getLogger(__name__)

TB_TAGS = [
    "train/box_loss", "train/obj_loss", "train/cls_loss",
    "metrics/precision", "metrics/recall", "metrics/mAP_0.5",
    "metrics/mAP_0.75", "metrics/mAP_0.5:0.95",
    "val/box_loss", "val/obj_loss", "val/cls_loss",
    "x/lr0", "x/lr1", "x/momentum",
]


class ExperimentLogger:
    """Unified scalar logger: TensorBoard + (optional) W&B + results.txt."""

    def __init__(self, save_dir: str, enable_tb: bool = True,
                 enable_wandb: bool = False, config: Optional[dict] = None,
                 run_name: str = "exp"):
        self.save_dir = Path(save_dir)
        self.tb = None
        self.wandb_run = None
        if enable_tb:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(str(self.save_dir / "tb"))
            except Exception as e:
                logger.warning(f"tensorboard unavailable: {e}")
        if enable_wandb:
            try:
                import wandb

                self.wandb_run = wandb.init(dir=str(self.save_dir),
                                            name=run_name, config=config)
            except Exception as e:
                logger.warning(f"wandb unavailable: {e}")

    def log_scalars(self, scalars: Dict[str, float], step: int):
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, float(v), step)
        if self.wandb_run is not None:
            self.wandb_run.log(scalars, step=step)

    def log_epoch(self, epoch: int, train_losses, eval_results: dict,
                  lrs: Optional[dict] = None):
        s = {
            "train/box_loss": train_losses[0],
            "train/obj_loss": train_losses[1],
            "train/cls_loss": train_losses[2],
        }
        if eval_results:
            s.update({
                "metrics/precision": eval_results.get("mp", 0.0),
                "metrics/recall": eval_results.get("mr", 0.0),
                "metrics/mAP_0.5": eval_results.get("map50", 0.0),
                "metrics/mAP_0.75": eval_results.get("map75", 0.0),
                "metrics/mAP_0.5:0.95": eval_results.get("map", 0.0),
            })
            if "val_loss" in eval_results:
                vb, vo, vc = eval_results["val_loss"]
                s.update({"val/box_loss": vb, "val/obj_loss": vo,
                          "val/cls_loss": vc})
        if lrs:
            s.update({f"x/{k}": v for k, v in lrs.items()})
        self.log_scalars(s, epoch)

    def close(self):
        if self.tb is not None:
            self.tb.close()
        if self.wandb_run is not None:
            self.wandb_run.finish()
