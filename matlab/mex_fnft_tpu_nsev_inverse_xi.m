% MEX_FNFT_TPU_NSEV_INVERSE_XI Canonical spectral grid for the inverse
% nonlinear Fourier transform.
%
%   XI = MEX_FNFT_TPU_NSEV_INVERSE_XI(D, T, M)
%   [XI, xi_grid] = MEX_FNFT_TPU_NSEV_INVERSE_XI(D, T, M, 'discr_...')
%
% DESCRIPTION
%   Interface to fnft_tpu_nsev_inverse_xi in libfnft_tpu.so; protocol
%   compatible with the reference's mex_fnft_nsev_inverse_XI. Contspec
%   samples handed to MEX_FNFT_TPU_NSEV_INVERSE must live on this grid.
%
% INPUTS
%   D               Number of time-domain samples
%   T               Real 1x2 vector [T0 T1]
%   M               Number of spectral samples
%   'discr_*'       Optional discretization token (default 2split2A,
%                   matching the reference default options)
%
% OUTPUTS
%   XI              Real 1x2 vector, first and last spectral point
%   xi_grid         Real 1xM vector, the full equidistant grid
