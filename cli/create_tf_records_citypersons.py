#!/usr/bin/env python
"""CityPersons -> tfrecords (parity with the reference script of the same name)."""

import logging
import time

from _common import parse_value, setup_logging
import argparse

from bayesian_yolov3_tpu.data.citypersons import process_dataset

DEFAULTS = {
    "out_dir": "$HOME/data/citypersons/tfrecords",  # edit
    "dataset_name": "citypersons",
    "anno_dir": "$HOME/data/citypersons",  # edit
    "img_dir": "$HOME/data/cityscapes",  # edit
    "train_shards": 3,
    "val_shards": 1,
    "shuffle": True,
}


def main():
    setup_logging()
    p = argparse.ArgumentParser()
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    args = p.parse_args()
    config = dict(DEFAULTS)
    for kv in args.set:
        k, _, v = kv.partition("=")
        config[k] = parse_value(v)

    logging.info("Saving results to %s", config["out_dir"])
    logging.info("----- START -----")
    start = time.time()
    process_dataset(**config)
    elapsed = int(time.time() - start)
    logging.info("----- FINISHED in %02d:%02d:%02d -----",
                 elapsed // 3600, (elapsed // 60) % 60, elapsed % 60)


if __name__ == "__main__":
    main()
