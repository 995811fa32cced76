from amss_tpu.train.engine import Trainer, make_model
