"""Assemble PARITY.md from oracle.json + ours_f32.json [+ ours_bf16.json]."""

import argparse
import json
import os


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="scratch/fullsize")
    ap.add_argument("--out", default="PARITY.md")
    ap.add_argument("--meta", default="", help="extra context line")
    args = ap.parse_args()

    oracle = load(os.path.join(args.dir, "oracle.json"))
    ours = load(os.path.join(args.dir, "ours_f32.json"))
    bf16_path = os.path.join(args.dir, "ours_bf16.json")
    bf16 = load(bf16_path) if os.path.exists(bf16_path) else None
    int8_path = os.path.join(args.dir, "ours_int8.json")
    int8 = load(int8_path) if os.path.exists(int8_path) else None

    def devs(a, b):
        dr, dp, agree = 0.0, 0.0, True
        for x, y in zip(a, b):
            for k in ("chosen_reward", "rejected_reward"):
                dr = max(dr, max(abs(u - v) for u, v in zip(x[k], y[k])))
            dp = max(dp, abs(x["prob_chosen"] - y["prob_chosen"]))
            agree &= x["decision"] == y["decision"]
        return dr, dp, agree

    lines = [
        "# PARITY — real-checkpoint side-by-side vs the reference implementation",
        "",
        "Full-size Phi-3.5-vision checkpoint (synthesized with the exact HF",
        "state-dict layout — published weights are unreachable in this zero-egress",
        "environment, see tools/synth_fullsize.py) + LLaVA-Reward artifact",
        "(LoRA r=128 PEFT adapter, GPM dim-2 head, SkipCA, ft-projector),",
        "consumed side-by-side by:",
        "",
        "- **oracle**: the REFERENCE'S vendored `Phi3VForCausalLM`",
        "  (`/root/reference/.../modeling_phi3_v.py`, strict state-dict load) +",
        "  `custom_forward` semantics (`rw_model_general_preference.py:334-448`),",
        "  torch fp32 CPU (tools/parity_oracle.py);",
        "- **ours**: `load_reward_adaptor` -> jitted reward forward",
        "  (tools/parity_ours.py).",
        "",
    ]
    if args.meta:
        lines += [args.meta, ""]
    lines += [
        "| pair | oracle prob | ours f32 prob | decision match |",
        "|---|---|---|---|",
    ]
    for x, y in zip(oracle, ours):
        lines.append(
            f"| {x['pair']} | {x['prob_chosen']:.6f} | {y['prob_chosen']:.6f} | "
            f"{'yes' if x['decision'] == y['decision'] else 'NO'} |"
        )
    dr, dp, agree = devs(oracle, ours)
    lines += [
        "",
        f"- max |reward| deviation (f32 vs oracle): **{dr:.2e}**"
        f" (target <= 1e-3, BASELINE.md)",
        f"- max |prob| deviation: **{dp:.2e}**",
        f"- pairwise decisions: **{'all match' if agree else 'MISMATCH'}**",
    ]
    if bf16:
        dr2, dp2, agree2 = devs(oracle, bf16)
        lines += [
            f"- bf16-on-device vs fp32 oracle: max |reward| dev {dr2:.2e}, "
            f"max |prob| dev {dp2:.2e}, decisions "
            f"{'all match' if agree2 else 'MISMATCH'}",
        ]
    if int8:
        dr3, dp3, agree3 = devs(oracle, int8)
        lines += [
            f"- int8 (--load_in_8bit w8a8 decoder) vs fp32 oracle: max |reward| "
            f"dev {dr3:.2e}, max |prob| dev {dp3:.2e}, decisions "
            f"{'all match' if agree3 else 'MISMATCH'}",
        ]
    lines += [
        "",
        "Reproduce: `python tools/synth_fullsize.py && python tools/parity_inputs.py",
        "&& python tools/parity_oracle.py && python tools/parity_ours.py --platform cpu",
        "&& python tools/parity_ours.py --platform device && python tools/parity_report.py`.",
        "A reduced (2-layer, full-width) variant of the same pipeline runs in CI:",
        "tests/test_oracle_parity.py.",
        "",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.out}: max reward dev {dr:.2e}, decisions "
          f"{'match' if agree else 'MISMATCH'}")


if __name__ == "__main__":
    main()
