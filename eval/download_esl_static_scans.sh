#!/bin/bash

# Download the ESL static dataset time-surface scans + calibration
# (reference: eval/x-map-eval.sh:19-36).  Skips files already present.
# Usage: download_esl_static_scans.sh [data_folder]

set -euo pipefail

data_folder="${1:-${XMAPS_ESL_DATA:-${ESL_DATA:-/ESL_data}}}"
static_folder="$data_folder/static"
mkdir -p "$static_folder"

esl_data_url="https://rpg.ifi.uzh.ch/data/esl/static"

echo "Downloading and extracting data to ${static_folder} ..."
for seq_names in "seq1 book_duck" "seq2 plant" "seq3 city_of_lights" \
                 "seq4 desk" "seq5 chair" "seq6 room" "seq7 cycle" \
                 "seq8 heart" "seq9 david"
do
    tuple=( $seq_names );
    full_url="${esl_data_url}/${tuple[1]}/scans_np.zip"
    dest_folder="${static_folder}/${tuple[0]}/"
    wget --no-clobber "$full_url" -P "$dest_folder"
    unzip -q -u "$dest_folder/scans_np.zip" -d "$dest_folder"
done

echo "Downloading calibration..."
wget --no-clobber "https://raw.githubusercontent.com/uzh-rpg/ESL/734bf8e88f689db79a0b291b1fb30839c6dd4130/data/calib.yaml" -P "$data_folder"
