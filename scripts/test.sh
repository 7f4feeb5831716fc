#!/usr/bin/env bash
set -e
python main.py --config configs/config_files/p2rnet_test.yaml --mode test "$@"
