"""Python client for the graft REST service.

Mirrors the reference client's API surface (reference
python/superdb/superdb.py: Client.create_pool/load/query/query_raw,
decode_zjson) using only the Python standard library so it runs in
minimal environments: urllib instead of requests, datetime.fromisoformat
instead of dateutil, and a small zed-duration parser instead of
durationpy.
"""

import binascii
import datetime
import decimal
import getpass
import ipaddress
import json
import os
import os.path
import re
import urllib.error
import urllib.parse
import urllib.request


class Client():
    def __init__(self,
                 base_url=os.environ.get('GRAFT_LAKE', 'http://localhost:9867'),
                 config_dir=os.path.expanduser('~/.graft')):
        self.base_url = base_url.rstrip('/')
        self.headers = {'Accept': 'application/x-zjson'}
        token = self.__get_auth_token(config_dir)
        if token is not None:
            self.headers['Authorization'] = 'Bearer ' + token

    def __get_auth_token(self, config_dir):
        creds_path = os.path.join(config_dir, 'credentials.json')
        try:
            with open(creds_path) as f:
                creds = json.load(f)
        except (FileNotFoundError, ValueError):
            return None
        services = creds.get('services', {})
        if self.base_url in services:
            return services[self.base_url].get('access')
        return None

    def __post(self, path, data, headers=None, content_type='application/json'):
        hdrs = dict(self.headers)
        if headers:
            hdrs.update(headers)
        hdrs.setdefault('Content-Type', content_type)
        if isinstance(data, str):
            data = data.encode('utf-8')
        req = urllib.request.Request(self.base_url + path, data=data,
                                     headers=hdrs, method='POST')
        try:
            return urllib.request.urlopen(req)
        except urllib.error.HTTPError as e:
            body = e.read()
            try:
                message = json.loads(body)['error']
            except Exception:
                raise RequestError(body.decode('utf-8', 'replace'), e) from None
            raise RequestError(message, e) from None

    def create_pool(self, name, layout={'order': 'desc', 'keys': [['ts']]},
                    thresh=0):
        r = self.__post('/pool', json.dumps({
            'name': name,
            'layout': layout,
            'thresh': thresh,
        }))
        r.read()
        r.close()

    def load(self, pool_name_or_id, data, branch_name='main',
             commit_author=None, commit_body=''):
        if commit_author is None:
            try:
                commit_author = getpass.getuser()
            except Exception:
                commit_author = 'graft-python'
        pool = urllib.parse.quote(pool_name_or_id, safe='')
        branch = urllib.parse.quote(branch_name, safe='')
        path = '/pool/' + pool + '/branch/' + branch
        commit_message = {'author': commit_author, 'body': commit_body}
        r = self.__post(path, data,
                        headers={'Zed-Commit': json.dumps(commit_message)},
                        content_type='application/x-zson')
        r.read()
        r.close()

    def query(self, query):
        r = self.query_raw(query)
        zjson = (json.loads(line) for line in r if line.strip())
        return decode_zjson(zjson)

    def query_raw(self, query, headers=None):
        return self.__post('/query', json.dumps({'query': query}),
                           headers=headers)


class RequestError(Exception):
    """Raised by Client methods when an HTTP request fails."""
    def __init__(self, message, response):
        super(RequestError, self).__init__(message)
        self.response = response


class QueryError(Exception):
    """Raised by Client.query() when a query fails."""
    pass


_DURATION_UNITS = {'ns': 1, 'us': 1000, 'µs': 1000, 'ms': 10**6,
                   's': 10**9, 'm': 60 * 10**9, 'h': 3600 * 10**9,
                   'd': 86400 * 10**9, 'w': 7 * 86400 * 10**9,
                   'y': 31536000 * 10**9}


def parse_duration(s):
    """zed duration literal ("1h2m3.5s", "-150ms") -> datetime.timedelta."""
    if s in ('0', '0s'):
        return datetime.timedelta(0)
    sign = 1
    if s.startswith('-'):
        sign, s = -1, s[1:]
    ns = 0
    for num, unit in re.findall(r'(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h|d|w|y)', s):
        ns += int(round(float(num) * _DURATION_UNITS[unit]))
    return datetime.timedelta(microseconds=sign * ns / 1000)


def _parse_time(s):
    # fromisoformat pre-3.11 rejects 'Z' and >6 fractional digits
    s = s.replace('Z', '+00:00')
    m = re.match(r'(.*\.\d{6})\d+([+-].*)?$', s)
    if m:
        s = m.group(1) + (m.group(2) or '')
    return datetime.datetime.fromisoformat(s)


def decode_zjson(zjson):
    types = {}
    for msg in zjson:
        typ, value = msg['type'], msg['value']
        if isinstance(typ, dict):
            yield _decode_value(_decode_type(types, typ), value)
        elif typ == 'QueryError':
            raise QueryError(value['error'])


def _decode_type(types, typ):
    kind = typ['kind']
    if kind == 'ref':
        return types[typ['id']]
    if kind == 'primitive':
        return typ
    elif kind == 'record':
        for f in typ['fields']:
            f['type'] = _decode_type(types, f['type'])
    elif kind in ['array', 'set']:
        typ['type'] = _decode_type(types, typ['type'])
    elif kind == 'map':
        typ['key_type'] = _decode_type(types, typ['key_type'])
        typ['val_type'] = _decode_type(types, typ['val_type'])
    elif kind == 'union':
        typ['types'] = [_decode_type(types, t) for t in typ['types']]
    elif kind == 'enum':
        pass
    elif kind in ['error', 'named']:
        typ['type'] = _decode_type(types, typ['type'])
    else:
        raise Exception(f'unknown type kind {kind}')
    types[typ['id']] = typ
    return typ


def _decode_value(typ, value):
    if value is None:
        return None
    kind = typ['kind']
    if kind == 'primitive':
        name = typ['name']
        if name in ['uint8', 'uint16', 'uint32', 'uint64',
                    'int8', 'int16', 'int32', 'int64']:
            return int(value)
        if name == 'duration':
            return parse_duration(value)
        if name == 'time':
            return _parse_time(value)
        if name in ['float16', 'float32', 'float64']:
            return float(value)
        if name == 'decimal':
            return decimal.Decimal(value)
        if name == 'bool':
            return value == 'true'
        if name == 'bytes':
            return binascii.a2b_hex(value[2:])
        if name == 'string':
            return value
        if name == 'ip':
            return ipaddress.ip_address(value)
        if name == 'net':
            return ipaddress.ip_network(value)
        if name == 'type':
            return value
        if name == 'null':
            return None
        raise Exception(f'unknown primitive name {name}')
    if kind == 'record':
        return {f['name']: _decode_value(f['type'], v)
                for f, v in zip(typ['fields'], value)}
    if kind == 'array':
        return [_decode_value(typ['type'], v) for v in value]
    if kind == 'set':
        return {_decode_value(typ['type'], v) for v in value}
    if kind == 'map':
        key_type, val_type = typ['key_type'], typ['val_type']
        return {_decode_value(key_type, v[0]): _decode_value(val_type, v[1])
                for v in value}
    if kind == 'union':
        type_index, val = value
        return _decode_value(typ['types'][int(type_index)], val)
    if kind == 'enum':
        return typ['symbols'][int(value)]
    if kind in ['error', 'named']:
        return _decode_value(typ['type'], value)
    raise Exception(f'unknown type kind {kind}')


if __name__ == '__main__':
    import argparse
    import pprint

    parser = argparse.ArgumentParser(
        description='Query a graft lake service and print results.',
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument('query')
    args = parser.parse_args()

    c = Client()
    for record in c.query(args.query):
        pprint.pprint(record)
