#!/usr/bin/env bash
# live1+ with stream-dropout augmentation (reference scripts/ego4d/live1+_aug.sh)
exec "$(dirname "$0")/live1+.sh" --augmentation true "$@"
