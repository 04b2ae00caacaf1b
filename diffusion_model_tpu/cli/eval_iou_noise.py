"""CLI: IoU / noise evaluation — thin wrapper over eval.iou_noise (flag
parity with /root/reference/eval_iou_noise.py:304-313)."""
from ..eval.iou_noise import main

if __name__ == "__main__":
    main()
