"""Entry point: RE10K novel-view-synthesis evaluation.

Parity target: `evaluation/novel_view_synthesis_bench/nvs_eval.py:156-196`
+ `calculate_metric.py` — render target views per sequence, dump gt/pred
PNGs, aggregate PSNR/SSIM(/LPIPS) CSVs.
"""

from __future__ import annotations

import json

from vist3a_tpu.cli.arguments import stitching_nvs_evaluation_argument
from vist3a_tpu.eval import nvs
from vist3a_tpu.eval.re10k import Re10KNVSDataset


def main(args):
    from vist3a_tpu.cli.model_loading import load_stitched_model

    params, scfg = load_stitched_model(args)
    name, root = args.dataset[0]
    if name != "re10k":
        raise NotImplementedError(f"NVS dataset {name} not implemented")
    dataset = Re10KNVSDataset(str(root), split="test",
                              load_img_size=args.resolution,
                              feedforward_img_size=args.feedforward_resolution)
    with open(args.seq_id_map) as f:
        seq_id_map = json.load(f)
    nvs.run_nvs_bench(params, dataset, seq_id_map, scfg, args.output_dir)
    result = nvs.compute_metrics_for_dir(f"{args.output_dir}/images")
    nvs.write_metric_csvs(result, args.output_dir)
    print(result["overall"])


if __name__ == "__main__":
    main(stitching_nvs_evaluation_argument().parse_args())
