/* Stand-in: statistics tables live in the weights blob in this build. */
#ifndef DRED_RDOVAE_STATS_DATA_H
#define DRED_RDOVAE_STATS_DATA_H
#endif
