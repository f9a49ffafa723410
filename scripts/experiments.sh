#!/usr/bin/env bash
# Paper workload grids (reference */experiments.sh), driven through the
# gpboi CLI. Each run exports HDF5 artifacts; the final step regenerates
# the paper figure set from them via the viz.paper drivers — a straight
# replay of the reference's recorded runs, artifact names included
# (reference PDEs/experiments.sh:13-29, ODEs/experiments.sh:11-18,
# PDEsMulti/experiments.sh:6-7).
set -euo pipefail

NDRAWS=600

# --- Euler (reference PDEs/experiments.sh:6-30) --------------------------------
# Noisy data (--ddtdata on ex1a, as the reference's recorded run does).
gpboi euler 0.06 200 0.03 400 6  --ndraws $NDRAWS --exportto data/euler/ex1a --noopen --ddtdata
gpboi euler 0.06 200 0.03 50 6   --ndraws $NDRAWS --exportto data/euler/ex1b --noopen
gpboi euler 0.06 200 0.03 3200 6 --ndraws $NDRAWS --exportto data/euler/ex1c --noopen
gpboi euler 0.06 200 0.01 400 6  --ndraws $NDRAWS --exportto data/euler/ex1d --noopen
gpboi euler 0.06 200 0.05 400 6  --ndraws $NDRAWS --exportto data/euler/ex1e --noopen
# Singular value decay.
gpboi euler 0.06 200 0.03 400 8  --ndraws $NDRAWS --exportto data/euler/ex1r8 --noopen
# Sparse data (--ddtdata on ex2a).
gpboi euler 0.06 50 0.01 400 6   --ndraws $NDRAWS --exportto data/euler/ex2a --noopen --ddtdata
gpboi euler 0.06 50 0.01 50 6    --ndraws $NDRAWS --exportto data/euler/ex2b --noopen
gpboi euler 0.06 50 0.01 3200 6  --ndraws $NDRAWS --exportto data/euler/ex2c --noopen
gpboi euler 0.06 20 0.01 400 6   --ndraws $NDRAWS --exportto data/euler/ex2d --noopen
gpboi euler 0.06 80 0.01 400 6   --ndraws $NDRAWS --exportto data/euler/ex2e --noopen

# --- SEIRD (reference ODEs/experiments.sh:6-18) --------------------------------
# Noisy data.
gpboi seird 90 90 0.10 360   --ndraws $NDRAWS --exportto data/seird/ex1a --noopen
gpboi seird 60 60 0.10 240   --ndraws $NDRAWS --exportto data/seird/ex1c --noopen
gpboi seird 120 120 0.10 480 --ndraws $NDRAWS --exportto data/seird/ex1d --noopen
# Sparse data.
gpboi seird 120 10 0.05 480  --ndraws $NDRAWS --exportto data/seird/ex2a --noopen
gpboi seird 60 10 0.05 240   --ndraws $NDRAWS --exportto data/seird/ex2c --noopen
gpboi seird 90 10 0.05 360   --ndraws $NDRAWS --exportto data/seird/ex2d --noopen

# --- Multi-trajectory cubic heat (reference PDEsMulti/experiments.sh:6) --------
gpboi heat 1.0 20 0.05 80 5 --ndraws $NDRAWS --exportto data/heat3/ex3 --noopen

# --- Figures (reference */plots_paper.py drivers) -------------------------------
python3 - <<'EOF'
from gp_bayesopinf_tpu.viz.paper import euler_paper, seird_paper, heat_paper

euler_paper(datadir="data/euler", savedir="figures/euler")
seird_paper(datadir="data/seird", savedir="figures/seird")
heat_paper(datadir="data/heat3", savedir="figures/heat")
EOF
