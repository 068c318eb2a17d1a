#!/bin/bash
# TensorBoard over the training logs (reference start_tensorboard.sh).
# The trainer writes reference-compatible scalar tags via tensorboardX.
tensorboard --logdir="logs"
