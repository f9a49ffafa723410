#!/usr/bin/env bash
# Paper workload grids (reference */experiments.sh), driven through the
# gpboi CLI. Each run exports HDF5 artifacts for the figure scripts.
set -euo pipefail

NDRAWS=600

# --- Euler (reference PDEs/experiments.sh:6-30) --------------------------------
gpboi euler 0.06 200 0.03 400 6  --ndraws $NDRAWS --exportto data/euler/ex1a --noopen
gpboi euler 0.06 200 0.03 50 6   --ndraws $NDRAWS --exportto data/euler/ex1b --noopen
gpboi euler 0.06 200 0.03 3200 6 --ndraws $NDRAWS --exportto data/euler/ex1c --noopen
gpboi euler 0.06 200 0.01 400 6  --ndraws $NDRAWS --exportto data/euler/ex1noise1 --noopen
gpboi euler 0.06 200 0.05 400 6  --ndraws $NDRAWS --exportto data/euler/ex1noise5 --noopen
gpboi euler 0.06 200 0.03 400 8  --ndraws $NDRAWS --exportto data/euler/ex1r8 --noopen
gpboi euler 0.06 50 0.01 400 6   --ndraws $NDRAWS --exportto data/euler/ex2a --noopen
gpboi euler 0.06 50 0.01 50 6    --ndraws $NDRAWS --exportto data/euler/ex2b --noopen
gpboi euler 0.06 50 0.01 3200 6  --ndraws $NDRAWS --exportto data/euler/ex2c --noopen
gpboi euler 0.06 20 0.01 400 6   --ndraws $NDRAWS --exportto data/euler/ex2d --noopen
gpboi euler 0.06 80 0.01 400 6   --ndraws $NDRAWS --exportto data/euler/ex2e --noopen

# --- SEIRD (reference ODEs/experiments.sh:6-18) --------------------------------
gpboi seird 90 90 0.10 360   --ndraws $NDRAWS --exportto data/seird/ex1a --noopen
gpboi seird 60 60 0.10 240   --ndraws $NDRAWS --exportto data/seird/ex1b --noopen
gpboi seird 120 120 0.10 480 --ndraws $NDRAWS --exportto data/seird/ex1c --noopen
gpboi seird 120 10 0.05 480  --ndraws $NDRAWS --exportto data/seird/ex2a --noopen
gpboi seird 60 10 0.05 240   --ndraws $NDRAWS --exportto data/seird/ex2b --noopen
gpboi seird 90 10 0.05 360   --ndraws $NDRAWS --exportto data/seird/ex2d --noopen

# --- Multi-trajectory cubic heat (reference PDEsMulti/experiments.sh:6) --------
gpboi heat 1.0 20 0.05 80 5 --ndraws $NDRAWS --exportto data/heat/ex3 --noopen
