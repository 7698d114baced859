#!/bin/bash
python -m declip_tpu.solver --config config.yaml "$@"
