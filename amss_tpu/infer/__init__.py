from amss_tpu.infer.streaming import StreamingSeparator, BucketSpec
from amss_tpu.infer.evaluate import evaluate_separation
