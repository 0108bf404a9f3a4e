"""Data-generation CLI: Heterogeneous Health-MNIST.

Flag surface matches /root/reference/Heterogeneous_Health_MNIST_generate.py:18-43
plus ``--splits`` for producing the train/test/validation/prediction files the
canonical config consumes in one run.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from hlax.data import generate as gen


def parse_arguments(argv=None):
    p = argparse.ArgumentParser(
        description="Enter configuration for generating data")
    p.add_argument("--source", type=str, default="",
                   help="Path to MNIST image root (optional; synthetic glyphs "
                        "are drawn when absent)")
    p.add_argument("--destination", type=str, default="./data")
    p.add_argument("--num_3", type=int, default=100)
    p.add_argument("--num_6", type=int, default=100)
    p.add_argument("--missing", type=float, default=25)
    p.add_argument("--data_file_name", type=str, default="health_MNIST_data.csv")
    p.add_argument("--data_masked_file_name", type=str,
                   default="health_MNIST_data_masked.csv")
    p.add_argument("--labels_file_name", type=str, default="health_MNIST_label.csv")
    p.add_argument("--mask_file_name", type=str, default="mask.csv")
    p.add_argument("--datatype_config", type=str, default="D1",
                   choices=["D1", "D2", "D3", "D4", "D5"])
    p.add_argument("--seed", type=int, default=100)
    p.add_argument("--splits", type=str, default="",
                   help="comma list like 'train,test,validation,prediction' — "
                        "writes <split>_data_<cfg>.csv etc. for the canonical "
                        "config in one run")
    return vars(p.parse_args(argv))


def main(argv=None):
    opt = parse_arguments(argv)
    for key in opt:
        print(f"{key}: {opt[key]}")
    dest = opt["destination"]
    os.makedirs(dest, exist_ok=True)
    cfgname = opt["datatype_config"]

    if opt["splits"]:
        seed = opt["seed"]
        for i, split in enumerate(s.strip() for s in opt["splits"].split(",")):
            out = gen.generate(opt["num_3"], opt["num_6"], opt["missing"],
                               cfgname, seed + i, opt["source"] or None)
            gen.write_csvs(out, dest, cfgname, prefix=f"{split}_")
            # canonical-config file names (config/hlvae_config_file.txt:6-21)
            os.replace(os.path.join(dest, f"{split}_data.csv"),
                       os.path.join(dest, f"{split}_data_{cfgname}.csv"))
            os.replace(os.path.join(dest, f"{split}_labels.csv"),
                       os.path.join(dest, f"{split}_label.csv"))
            print(f"Saved split {split}: {out['data'].shape[0]} samples")
        return

    out = gen.generate(opt["num_3"], opt["num_6"], opt["missing"],
                       cfgname, opt["seed"], opt["source"] or None)
    np.savetxt(os.path.join(dest, opt["data_file_name"]), out["data"],
               fmt="%d", delimiter=",")
    np.savetxt(os.path.join(dest, opt["mask_file_name"]), out["mask"],
               fmt="%d", delimiter=",")
    np.savetxt(os.path.join(dest, opt["data_masked_file_name"]),
               out["masked_data"], fmt="%d", delimiter=",")
    with open(os.path.join(dest, opt["labels_file_name"]), "w") as f:
        f.write(",".join(gen.LABEL_COLUMNS) + "\n")
        for row in out["labels"]:
            f.write(",".join("nan" if np.isnan(v) else f"{v:.6g}"
                             for v in row) + "\n")
    print(f"Saved! Number of samples: {out['data'].shape[0]}")


if __name__ == "__main__":
    main()
