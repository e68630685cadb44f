#!/bin/bash

# Download the ESL static .raw event recordings + .bias files for live
# replay through the streaming pipeline
# (reference: eval/download_ESl_static_raw_bias.sh).
# Usage: download_esl_static_raw_bias.sh [data_folder]

set -euo pipefail

data_folder="${1:-${XMAPS_ESL_DATA:-${ESL_DATA:-/ESL_data}}}"
static_folder="$data_folder/static"
mkdir -p "$static_folder"

esl_data_url="https://rpg.ifi.uzh.ch/data/esl/static"

for seq_names in "seq1 book_duck" "seq2 plant" "seq3 city_of_lights" \
                 "seq4 desk" "seq5 chair" "seq6 room" "seq7 cycle" \
                 "seq8 heart" "seq9 david"
do
    tuple=( $seq_names );
    dest_folder="${static_folder}/${tuple[0]}/"
    wget --no-clobber "${esl_data_url}/${tuple[1]}/data.raw" -P "$dest_folder"
    wget --no-clobber "${esl_data_url}/${tuple[1]}/data.bias" -P "$dest_folder"
done
