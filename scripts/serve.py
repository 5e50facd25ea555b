"""JSON-lines streaming inference server over stdin/stdout.

Protocol (one JSON object per line):
  in:  {"marker_pos": [M*3 floats], "marker_ori": [M*9 floats]}   one frame
       {"cmd": "reset"}                                           new sequence
       {"cmd": "flush"}                                           drain buffer
  out: {"frame": i, "root_ori": [3], "pose_body": [63], "shape": [10]?}
       (emitted per frame once its chunk completes)

Usage: python scripts/serve.py --model_id <id> [--chunk 16] < frames.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args):
    from empose_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np
    from empose_tpu.serve import StreamingPredictor

    predictor = StreamingPredictor.from_experiment(args.model_id, chunk_size=args.chunk)
    frame_idx = 0

    def emit(out):
        nonlocal frame_idx
        if out is None:
            return
        k = out["pose_body"].shape[0]
        for i in range(k):
            rec = {"frame": frame_idx,
                   "root_ori": out["root_ori"][i].tolist(),
                   "pose_body": out["pose_body"][i].tolist()}
            if "shape" in out:
                rec["shape"] = out["shape"][i].tolist()
            print(json.dumps(rec), flush=True)
            frame_idx += 1

    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        msg = json.loads(line)
        if msg.get("cmd") == "reset":
            emit(predictor.flush())
            predictor.reset()
            frame_idx = 0
            continue
        if msg.get("cmd") == "flush":
            emit(predictor.flush())
            continue
        emit(predictor.push(np.asarray(msg["marker_pos"], np.float32)[None],
                            np.asarray(msg["marker_ori"], np.float32)[None]))
    emit(predictor.flush())


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model_id", required=True)
    p.add_argument("--chunk", type=int, default=16)
    main(p.parse_args())
