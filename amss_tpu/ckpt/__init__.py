from amss_tpu.ckpt.checkpoint import (
    save_checkpoint,
    restore_checkpoint,
    restore_subtree,
    best_checkpoint_dir,
)
