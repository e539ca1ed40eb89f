function ok = is_valid_handle(h)
% a bridge handle is a struct with ptr + init_key matching the daemon's
% live key (the daemon itself re-validates on every command)
ok = isstruct(h) && isfield(h, 'ptr') && isfield(h, 'init_key') ...
     && caffe_('get_init_key') == h.init_key;
end
