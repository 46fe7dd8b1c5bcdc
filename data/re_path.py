"""Dataset path-rebasing tool (the reference's data/re_path.py equivalent):

    python data/re_path.py in.json /old/base /new/base out.json
"""

import sys

from llava_reward_tpu.data.datasets import rewrite_paths

if __name__ == "__main__":
    if len(sys.argv) != 5:
        sys.exit(__doc__)
    n = rewrite_paths(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4])
    print(f"rewrote {n} paths -> {sys.argv[4]}")
